"""How much of the rare-shingle pass volume is redundant blocks (identical
member sets) and what each pass contributes to raw pair fan-out.

Usage: SPARK_GRAFT_DIAG_ENTITIES=144000 SPARK_GRAFT_CPUS=16 \
       python scripts/diagnose_rare_dups.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from entity_resolver_spark import datagen  # noqa: E402
from entity_resolver_spark.config import EngineConfig  # noqa: E402
from entity_resolver_spark.operators import blocking as B  # noqa: E402
from entity_resolver_spark.operators.transcripts import build_entity_records  # noqa: E402
from entity_resolver_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_entities = int(os.environ.get("SPARK_GRAFT_DIAG_ENTITIES", "144000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("rare-diag", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()
    cfg = EngineConfig(rare_shingle_per_record=0)
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
    records = build_entity_records(transcripts).localCheckpoint()
    records.count()

    rare = B.rare_shingle_blocks(records, cfg).localCheckpoint()
    grouped = (
        rare.groupBy("block_key")
        .agg(F.sort_array(F.collect_list("conv_id")).alias("mem"))
        .localCheckpoint()
    )
    stats = grouped.select(
        F.count(F.lit(1)).alias("blocks"),
        F.sum(F.size("mem")).alias("rows"),
        F.sum(F.size("mem") * (F.size("mem") - 1) / 2).alias("fanout"),
    ).collect()[0]
    uniq = grouped.dropDuplicates(["mem"]).select(
        F.count(F.lit(1)).alias("blocks"),
        F.sum(F.size("mem")).alias("rows"),
        F.sum(F.size("mem") * (F.size("mem") - 1) / 2).alias("fanout"),
    ).collect()[0]
    print("rare blocks:   ", dict(stats.asDict()), flush=True)
    print("rare unique-set:", dict(uniq.asDict()), flush=True)
    # singleton member sets (size 1) are pure overhead — they emit no pairs
    ones = grouped.where(F.size("mem") == 1).count()
    print("rare size-1 blocks:", ones, flush=True)

    for name, df in (
        ("battery", B._explode_keys(
            records,
            [*B._exact_key_exprs(), *B._anchor_key_arrays(cfg.anchor_forms)],
        )),
        ("minhash_text", B.minhash_lsh_blocks(records, cfg)),
    ):
        split = B.split_hot_blocks(df, cfg)
        d = split.groupBy("block_key").agg(F.count(F.lit(1)).alias("n")).select(
            F.count(F.lit(1)).alias("blocks"),
            F.sum("n").alias("rows"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("fanout"),
        ).collect()[0]
        print(f"{name} (post-split):", dict(d.asDict()), flush=True)


if __name__ == "__main__":
    main()
