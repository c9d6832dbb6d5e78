"""Rare-shingle inverted-index blocking variant at the 24k corpus."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from entity_resolver_spark import datagen
from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.functions.hashing import shingles_expr
from entity_resolver_spark.operators import blocking as B
from entity_resolver_spark.operators.transcripts import build_entity_records
from entity_resolver_spark.session import get_spark


def main() -> None:
    n_entities = int(os.environ.get("SPARK_GRAFT_DIAG_ENTITIES", "24000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("er-diag-var2", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()

    cfg = EngineConfig()
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
    labeled = spark.createDataFrame(data["labeled_pairs"])
    records = build_entity_records(transcripts).localCheckpoint()
    truths = labeled.where("match").select(
        F.least("left", "right").alias("left"),
        F.greatest("left", "right").alias("right"),
    ).dropDuplicates(["left", "right"]).localCheckpoint()
    n_truth = truths.count()

    def rare_shingle_blocks(df_max: int):
        sh = records.select(
            "conv_id",
            F.explode(
                F.array_distinct(shingles_expr(F.col("tokens"), cfg.shingle_k))
            ).alias("_g"),
            B._sorted_name_key().alias("skey"),
        )
        dfreq = F.count(F.lit(1)).over(Window.partitionBy("_g"))
        return sh.select(
            "conv_id", "_g", "skey", dfreq.alias("_df")
        ).where(F.col("_df") <= df_max).select(
            "conv_id",
            F.concat(F.lit("r"), F.xxhash64("_g").cast("string")).alias("block_key"),
            "skey",
        )

    for df_max in (6, 12, 20):
        blocks = B.split_hot_blocks(
            B.all_blocks(records, cfg).unionByName(rare_shingle_blocks(df_max)), cfg
        )
        pairs = B.pairs_from_blocks(blocks).localCheckpoint()
        n_pairs = pairs.count()
        covered = truths.join(pairs, ["left", "right"], "left_semi").count()
        print(json.dumps({
            "variant": f"rare{df_max}",
            "pairs": n_pairs,
            "recall": round(covered / n_truth, 5),
            "missed": n_truth - covered,
        }), flush=True)


if __name__ == "__main__":
    main()
