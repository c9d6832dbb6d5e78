"""Grid over blocking-variant options at the 24k corpus: for each variant,
blocking recall on labeled true pairs and total candidate-pair volume.

Variants:
  base      — current all_blocks
  mh1row    — base + 1-row bands (individual minhash values) from the SAME
              16-hash text signature (canopy-on-rare-shingle approximation)
  snm48     — base with snm_window=48
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entity_resolver_spark import datagen
from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.functions.hashing import minhash_signature, shingles_expr
from entity_resolver_spark.operators import blocking as B
from entity_resolver_spark.operators.transcripts import build_entity_records
from entity_resolver_spark.session import get_spark


def main() -> None:
    n_entities = int(os.environ.get("SPARK_GRAFT_DIAG_ENTITIES", "24000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("er-diag-var", master=f"local[{cpus}]", shuffle_partitions=cpus)
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

    def mh1row_blocks(k1: int):
        with_sh = records.select(
            "conv_id",
            shingles_expr(F.col("tokens"), cfg.shingle_k).alias("_sh"),
            B._sorted_name_key().alias("skey"),
        )
        sig = minhash_signature(
            with_sh, "conv_id", "_sh", cfg.minhash_hashes, carry_cols=["skey"]
        )
        keys = F.transform(
            F.slice(F.col("sig"), 1, k1),
            lambda h, i: F.concat_ws(":", F.lit("m1"), i.cast("string"), h.cast("string")),
        )
        return sig.select("conv_id", F.explode(keys).alias("block_key"), "skey")

    variants = {
        "base": lambda: B.all_blocks(records, cfg),
        "mh1row8": lambda: B.all_blocks(records, cfg).unionByName(mh1row_blocks(8)),
        "mh1row16": lambda: B.all_blocks(records, cfg).unionByName(mh1row_blocks(16)),
        "snm48": lambda: B.all_blocks(
            records, EngineConfig(snm_window=48)
        ),
    }
    for name, fn in variants.items():
        blocks = B.split_hot_blocks(fn(), cfg)
        pairs = B.pairs_from_blocks(blocks).localCheckpoint()
        n_pairs = pairs.count()
        covered = truths.join(pairs, ["left", "right"], "left_semi").count()
        print(json.dumps({
            "variant": name,
            "pairs": n_pairs,
            "recall": round(covered / n_truth, 5),
            "missed": n_truth - covered,
        }), flush=True)


if __name__ == "__main__":
    main()
