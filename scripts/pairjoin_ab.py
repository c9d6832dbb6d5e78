"""A/B the pair self-join + dedup — the largest blocking component at 144k
(profile 2026-08-19: join_raw 17.8s, join+dedup 61.4s of a 183s er_blocking
wall at local[16]; 139.0M raw pair rows -> 44.4M distinct).

Stages the post-split block rows (conv_id, block_key) to parquet once
(.benchtmp/blocks144k/), then times variants of pairs_from_blocks:

  base    — shipped form: string self-join on block_key, `<` filter,
            dropDuplicates on (left, right) strings
  intid   — dictionary-encode conv_id -> dense int64 via a broadcast map
            BEFORE the self-join; join, `<`, dropDuplicates on 2x int64;
            decode back to strings with two broadcast joins (map-only)
  setdedup— member-set-dedup blocks ACROSS passes first (keep one block
            per identical member set), then the base join
  both    — setdedup + intid

Also reports raw-pair fanout per variant so recall-neutrality is visible
(intid must produce IDENTICAL pair sets; setdedup identical by definition).

Usage: SPARK_GRAFT_CPUS=16 python scripts/pairjoin_ab.py [stage] [variants..]
  `stage` (re)builds .benchtmp/blocks144k from datagen (~5 min).
Env: SPARK_GRAFT_PJA_ENTITIES (default 144000).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def steady(plan, n=1) -> tuple[float, int]:
    rows = plan.count()  # warm
    ws = []
    for _ in range(max(1, n)):
        t0 = time.monotonic()
        plan.write.format("noop").mode("overwrite").save()
        ws.append(time.monotonic() - t0)
    return sorted(ws)[len(ws) // 2], rows


def main() -> None:
    from entity_resolver_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_entities = int(os.environ.get("SPARK_GRAFT_PJA_ENTITIES", "144000"))
    blocks_dir = os.path.join(REPO, ".benchtmp", f"blocks{n_entities // 1000}k")
    spark = get_spark("pairjoin-ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()

    args = sys.argv[1:]
    if "stage" in args or not os.path.isdir(blocks_dir):
        from entity_resolver_spark import datagen
        from entity_resolver_spark.config import EngineConfig
        from entity_resolver_spark.operators.blocking import (
            all_blocks,
            split_hot_blocks,
        )
        from entity_resolver_spark.operators.transcripts import build_entity_records

        t0 = time.monotonic()
        data = datagen.generate(
            n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
        )
        transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
        records = build_entity_records(transcripts).localCheckpoint()
        cfg = EngineConfig()
        blocks = split_hot_blocks(
            all_blocks(records, cfg).localCheckpoint(), cfg, materialized=True
        )
        blocks.select("conv_id", "block_key").write.mode("overwrite").parquet(
            blocks_dir
        )
        print(f"staged {blocks_dir} in {time.monotonic() - t0:.1f}s", flush=True)

    variants = [a for a in args if a != "stage"] or ["base", "intid", "setdedup", "both"]
    blocks = spark.read.parquet(blocks_dir).localCheckpoint()
    n_block_rows = blocks.count()
    out: dict = {"n_entities": n_entities, "cpus": cpus, "block_rows": n_block_rows}

    # Dense id map: one row per distinct conv_id. 504k rows at 144k — under
    # the engine's 1M broadcast cap; a 100-TB run does the same encode with
    # a shuffle join (J1 dictionary-encode join) and still wins: the pair
    # join's shuffle volume dominates the one-time encode.
    ids = (
        blocks.select("conv_id")
        .distinct()
        .withColumn(
            "cid", F.row_number().over(__import__("pyspark").sql.Window.orderBy("conv_id")) - 1
        )
        .localCheckpoint()
    )
    n_ids = ids.count()
    out["n_ids"] = n_ids

    def base_join(b):
        a_ = b.alias("a")
        b_ = b.alias("b")
        return (
            a_.join(b_, "block_key")
            .where(F.col("a.conv_id") < F.col("b.conv_id"))
            .select(
                F.col("a.conv_id").alias("left"), F.col("b.conv_id").alias("right")
            )
            .dropDuplicates(["left", "right"])
        )

    def int_join(b):
        enc = b.join(F.broadcast(ids), "conv_id").select("cid", "block_key")
        a_ = enc.alias("a")
        b_ = enc.alias("b")
        pairs_i = (
            a_.join(b_, "block_key")
            .where(F.col("a.cid") < F.col("b.cid"))
            .select(F.col("a.cid").alias("lcid"), F.col("b.cid").alias("rcid"))
            .dropDuplicates(["lcid", "rcid"])
        )
        lmap = F.broadcast(ids.select(F.col("cid").alias("lcid"), F.col("conv_id").alias("left")))
        rmap = F.broadcast(ids.select(F.col("cid").alias("rcid"), F.col("conv_id").alias("right")))
        return pairs_i.join(lmap, "lcid").join(rmap, "rcid").select("left", "right")

    def bkh_join(b, hint=None):
        # Hash the string block_key to int64 BEFORE the self-join (map-only;
        # no encode join). A 64-bit collision merely MERGES two blocks —
        # extra candidate pairs, never lost ones — so the output pair set is
        # a superset with collision probability ~#keys^2/2^65 (~1e-7 at 44M
        # keys). Cuts exchange bytes and join-key compare cost.
        enc = b.select("conv_id", F.xxhash64("block_key").alias("bk"))
        a_ = enc.alias("a")
        b_ = enc.alias("b")
        rhs = b_.hint(hint) if hint else b_
        return (
            a_.join(rhs, "bk")
            .where(F.col("a.conv_id") < F.col("b.conv_id"))
            .select(
                F.col("a.conv_id").alias("left"), F.col("b.conv_id").alias("right")
            )
            .dropDuplicates(["left", "right"])
        )

    def base_hint_join(b, hint):
        a_ = b.alias("a")
        b_ = b.alias("b").hint(hint)
        return (
            a_.join(b_, "block_key")
            .where(F.col("a.conv_id") < F.col("b.conv_id"))
            .select(
                F.col("a.conv_id").alias("left"), F.col("b.conv_id").alias("right")
            )
            .dropDuplicates(["left", "right"])
        )

    def setdedup(b):
        # One survivor per identical member set: hash the sorted member list
        # per block, keep min(block_key) per hash. Exactly pair-preserving —
        # identical member sets generate identical pair sets.
        sig = (
            b.groupBy("block_key")
            .agg(F.xxhash64(F.array_sort(F.collect_list("conv_id"))).alias("sig"))
        )
        keep = sig.groupBy("sig").agg(F.min("block_key").alias("block_key"))
        return b.join(keep, "block_key", "left_semi")

    for v in variants:
        t0 = time.monotonic()
        if v == "base":
            plan = base_join(blocks)
        elif v == "intid":
            plan = int_join(blocks)
        elif v == "setdedup":
            kept = setdedup(blocks).localCheckpoint()
            out["setdedup_block_rows"] = kept.count()
            out["setdedup_prep_s"] = round(time.monotonic() - t0, 2)
            plan = base_join(kept)
        elif v == "both":
            kept = setdedup(blocks).localCheckpoint()
            plan = int_join(kept)
        elif v == "bkh":
            plan = bkh_join(blocks)
        elif v == "bkh_shj":
            plan = bkh_join(blocks, hint="shuffle_hash")
        elif v == "shj":
            plan = base_hint_join(blocks, "shuffle_hash")
        else:
            continue
        t0 = time.monotonic()
        wall, rows = steady(plan)
        out[v] = {"wall_s": round(wall, 2), "first_s": None, "rows": rows}
        print(v, out[v], flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
