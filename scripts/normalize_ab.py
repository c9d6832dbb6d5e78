"""Component profile of the normalize stage (build_entity_records) at a
given corpus size: is the wall the turn-text shuffle (groupBy collect_list)
or the post-agg expression battery (regex name extraction, NFKD, years,
tokens, hashes)?

Stages transcripts to a localCheckpoint first so datagen + upload are
excluded, then times (cold, once each — matching how bench times the stage):

  agg     — groupBy conv_id: array_sort(collect_list(struct)), count, min,
            tool set; concat to full_text/first_turn (no battery)
  full    — build_entity_records as shipped

Usage: SPARK_GRAFT_CPUS=16 SPARK_GRAFT_NAB_ENTITIES=144000 \
       python scripts/normalize_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def main() -> None:
    from entity_resolver_spark import datagen
    from entity_resolver_spark.operators.transcripts import build_entity_records
    from entity_resolver_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_entities = int(os.environ.get("SPARK_GRAFT_NAB_ENTITIES", "144000"))
    spark = get_spark("norm-ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()

    t0 = time.monotonic()
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = (
        datagen.to_spark(spark, data["transcripts"]).repartition(cpus).localCheckpoint()
    )
    n_turns = transcripts.count()
    out = {
        "n_entities": n_entities,
        "cpus": cpus,
        "n_turns": n_turns,
        "prep_s": round(time.monotonic() - t0, 1),
    }

    # agg-only: the shuffle + ordered concat, none of the scalar battery
    t0 = time.monotonic()
    agg = (
        transcripts.groupBy("conv_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("turn_idx", "text"))).alias("_t"),
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("started_at"),
            F.array_sort(F.array_distinct(F.collect_list("tool"))).alias("tools"),
        )
        .select(
            "conv_id",
            F.concat_ws(" ", F.transform("_t", lambda s: s["text"])).alias(
                "full_text"
            ),
            F.element_at(F.col("_t"), 1)["text"].alias("first_turn"),
            "n_turns",
            "started_at",
            "tools",
        )
    )
    agg.write.format("noop").mode("overwrite").save()
    out["agg_s"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    build_entity_records(transcripts).write.format("noop").mode("overwrite").save()
    out["full_s"] = round(time.monotonic() - t0, 2)
    out["battery_s"] = round(out["full_s"] - out["agg_s"], 2)

    # Materialization variants — what bench's localCheckpoint actually pays.
    # ckpt_all: every column (the pre-r5 bench shape; charges the stage for
    # text bytes no downstream stage reads). ckpt_ws: the working-set
    # projection bench ships now (models the pipeline's column-pruned
    # parquet stage reads — full_text/norm_text/first_turn/name_raw are
    # write-only downstream of normalize).
    t0 = time.monotonic()
    d = build_entity_records(transcripts).localCheckpoint()
    d.count()
    out["ckpt_all_s"] = round(time.monotonic() - t0, 2)
    d.unpersist()
    t0 = time.monotonic()
    d = (
        build_entity_records(transcripts)
        .drop("full_text", "norm_text", "first_turn", "name_raw")
        .localCheckpoint()
    )
    d.count()
    out["ckpt_ws_s"] = round(time.monotonic() - t0, 2)
    d.unpersist()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
