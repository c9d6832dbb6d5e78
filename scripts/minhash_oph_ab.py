"""A/B: current 16-independent-hash MinHash signature vs one-permutation
hashing (OPH) over the SAME staged shingle-hash rows.

Current production form (minhash_blocks_from_shingle_rows): per shingle row,
16x xxhash64(_gh, slot) inside 16 min() aggregates — 16 hash evaluations per
occurrence row. OPH (Li, Owen, Zhang 2012, "One Permutation Hashing"): one
pmod per row assigns the row to a slot; each slot takes min(_gh) over its own
rows — 16 NULL-cheap conditional mins instead of 16 hashes. Empty slots are
densified deterministically from the record's global min (borrowing), so
band keys never contain raw NULLs that would make two short docs collide on
emptiness alone.

Both variants are measured on the same localCheckpointed sh table (the
unified-scan input production uses), steady-state over noop writes, and the
probe also reports band-key collision volume (block rows and raw pair
fan-out) so a cheaper signature that floods downstream is visible here, not
in a full bench.

Usage: SPARK_GRAFT_OPH_ENTITIES=72000 SPARK_GRAFT_CPUS=16 \
       python scripts/minhash_oph_ab.py
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
from entity_resolver_spark.functions.hashing import lsh_band_keys  # noqa: E402
from entity_resolver_spark.operators.transcripts import (  # noqa: E402
    build_entity_records,
)
from entity_resolver_spark.session import get_spark  # noqa: E402


def steady(df, reps=3):
    """Median steady-state wall of materializing df to a noop sink."""
    walls = []
    df.write.format("noop").mode("overwrite").save()  # codegen warm-up
    for _ in range(reps):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    return sorted(walls)[len(walls) // 2]


def current_blocks(sh, cfg):
    return B.minhash_blocks_from_shingle_rows(sh, cfg)


def oph_blocks(sh, cfg):
    """OPH form: slot = pmod(xxhash64(_gh), H) (re-hash so the slot
    assignment is independent of the VALUE ordering min() uses), slot value =
    min(_gh) within the slot, empty slots densified from the record min."""
    h = cfg.minhash_hashes
    slot = F.pmod(F.xxhash64(F.col("_gh"), F.lit(-1)), F.lit(h))
    aggs = [
        F.min(F.when(slot == i, F.col("_gh"))).alias(f"_h{i}")
        for i in range(h)
    ] + [
        F.min(F.col("_gh")).alias("_gmin"),
        F.first("skey").alias("skey"),
    ]
    sig_cols = F.array(
        *[
            F.coalesce(
                F.col(f"_h{i}"), F.xxhash64(F.col("_gmin"), F.lit(i))
            )
            for i in range(h)
        ]
    )
    sig = sh.groupBy("conv_id").agg(*aggs).select(
        "conv_id", sig_cols.alias("sig"), "skey"
    )
    keys = lsh_band_keys(F.col("sig"), h, cfg.minhash_bands)
    tagged = F.transform(keys, lambda k: F.concat(F.lit("m"), k))
    return sig.select("conv_id", F.explode(tagged).alias("block_key"), "skey")


def fanout(blocks):
    row = (
        blocks.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.count(F.lit(1)).alias("blocks"),
            F.sum("n").alias("rows"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("fanout_pairs"),
            F.max("n").alias("max_block"),
        )
        .collect()[0]
    )
    return {k: int(row[k]) for k in ("blocks", "rows", "fanout_pairs", "max_block")}


def main() -> None:
    n_entities = int(os.environ.get("SPARK_GRAFT_OPH_ENTITIES", "72000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("oph-ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()
    cfg = EngineConfig()

    t0 = time.monotonic()
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
    records = build_entity_records(transcripts).localCheckpoint()
    n_rec = records.count()
    sh = B._shingle_hash_rows(records, cfg)
    n_sh = sh.count()
    out = {
        "n_entities": n_entities,
        "cpus": cpus,
        "n_records": n_rec,
        "n_shingle_rows": n_sh,
        "prep_s": round(time.monotonic() - t0, 1),
    }

    cur = current_blocks(sh, cfg)
    oph = oph_blocks(sh, cfg)
    out["cur_wall_s"] = round(steady(cur), 2)
    out["oph_wall_s"] = round(steady(oph), 2)
    out["cur_fanout"] = fanout(cur)
    out["oph_fanout"] = fanout(oph)

    # recall side: fraction of labeled true pairs each variant's band keys
    # catch ON ITS OWN (the pass runs inside a union; its solo recall is the
    # comparable sensitivity number)
    labeled = datagen.to_spark(spark, data["labeled_pairs"]).localCheckpoint()
    for tag, blocks in (("cur", cur), ("oph", oph)):
        bk = blocks.select("conv_id", "block_key")
        a = bk.alias("a")
        b = bk.alias("b")
        pairs = (
            a.join(b, "block_key")
            .where(F.col("a.conv_id") < F.col("b.conv_id"))
            .select(
                F.col("a.conv_id").alias("left"),
                F.col("b.conv_id").alias("right"),
            )
            .dropDuplicates(["left", "right"])
        )
        out[f"{tag}_solo_recall"] = round(B.blocking_recall(pairs, labeled), 5)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
