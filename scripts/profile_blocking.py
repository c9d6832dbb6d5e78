"""Per-component wall profile of the blocking stage (er_blocking) at a given
corpus size — which PASS and which JOIN eat the 144k wall, so optimization
targets the measured bottleneck rather than the largest-looking plan.

Usage: SPARK_GRAFT_PROF_ENTITIES=144000 SPARK_GRAFT_CPUS=16 \
       python scripts/profile_blocking.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from entity_resolver_spark import datagen  # noqa: E402
from entity_resolver_spark.config import EngineConfig  # noqa: E402
from entity_resolver_spark.operators import blocking as B  # noqa: E402
from entity_resolver_spark.operators.transcripts import build_entity_records  # noqa: E402
from entity_resolver_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_entities = int(os.environ.get("SPARK_GRAFT_PROF_ENTITIES", "144000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("blk-prof", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()
    cfg = EngineConfig()

    t0 = time.monotonic()
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
    records = build_entity_records(transcripts).localCheckpoint()
    n_rec = records.count()
    out = {"n_entities": n_entities, "cpus": cpus, "n_records": n_rec,
           "prep_s": round(time.monotonic() - t0, 1)}

    def step(name, df):
        t0 = time.monotonic()
        d = df.localCheckpoint()
        n = d.count()
        out[name] = {"wall_s": round(time.monotonic() - t0, 2), "rows": n}
        print(name, out[name], flush=True)
        return d

    # --- individual passes (each materialized separately) -------------------
    battery = step(
        "battery(exact+anchors)",
        B._explode_keys(
            records,
            [
                *B._exact_key_exprs(cfg.exact_plain_enabled),
                *B._anchor_key_arrays(cfg.anchor_forms),
            ],
        ),
    )
    mh = step("minhash_text", B.minhash_lsh_blocks(records, cfg))
    rare = step("rare_shingle", B.rare_shingle_blocks(records, cfg))

    blocks = battery.unionByName(mh).unionByName(rare).localCheckpoint()
    blocks.count()

    split = step("split_hot_blocks", B.split_hot_blocks(blocks, cfg, materialized=True))

    # --- pair self-join, de-composed -----------------------------------------
    bk = split.select("conv_id", "block_key").localCheckpoint()
    t0 = time.monotonic()
    a, b = bk.alias("a"), bk.alias("b")
    raw = (
        a.join(b, "block_key")
        .where(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(F.col("a.conv_id").alias("left"), F.col("b.conv_id").alias("right"))
    )
    n_raw = raw.count()
    out["pair_join_raw"] = {"wall_s": round(time.monotonic() - t0, 2), "rows": n_raw}
    print("pair_join_raw", out["pair_join_raw"], flush=True)

    t0 = time.monotonic()
    n_dedup = raw.dropDuplicates(["left", "right"]).count()
    out["pair_join+dedup"] = {
        "wall_s": round(time.monotonic() - t0, 2), "rows": n_dedup,
    }
    print("pair_join+dedup", out["pair_join+dedup"], flush=True)

    # block-size distribution of the split output (what the join fans out on)
    t0 = time.monotonic()
    dist = (
        split.groupBy("block_key").agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.count(F.lit(1)).alias("blocks"),
            F.sum("n").alias("rows"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("fanout_pairs"),
            F.max("n").alias("max_block"),
        )
        .collect()[0]
    )
    out["post_split_blocks"] = {k: int(dist[k]) for k in
                                ("blocks", "rows", "fanout_pairs", "max_block")}
    out["post_split_dist_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
