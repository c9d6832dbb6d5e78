"""Component profile of the pair_inputs stage (the dominant stage at the
protocol corpus: ~53% of end-to-end at 72k entities / 19.65M pairs).

Stages records/pairs/vectors parquet once (.benchtmp/pia<N>/), then times
(median of 3 steady-state noop writes after 1 warm pass) sub-plans of
pair_inputs at SPARK_GRAFT_CPUS parallelism. Column pruning drops the
unused UDF columns from each sub-plan, so the deltas isolate components:

  join      — pairs x side(L) x side(R), scalar columns only (no UDFs)
  tax       — join + taxonomy_dissimilarity (native expression)
  cosine    — join + text_cosine (sparse_cosine_pudf over map keys/values)
  kmv       — join + text_jaccard (KMV sketch kernel, 64 longs/side)
  cosnat    — join + sparse_cosine_expr (native map_zip_with form)
  kmvnat    — join + kmv_jaccard_expr (native expression form)
  full      — the pair_inputs select as shipped
  staged    — full + repartitionByRange + localCheckpoint (bench's
              er_pair_inputs measurement, layout exchange included)

Usage: SPARK_GRAFT_CPUS=8 python scripts/pair_inputs_ab.py [sub ...]
Env: SPARK_GRAFT_PIA_ENTITIES (default 72000) picks the corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def steady(plan) -> float:
    # SPARK_GRAFT_PIA_REPS=0 -> one COLD pass, no warm-up: for multi-minute
    # plans (the 288k crossover A/B) codegen warm-up is fully amortized and
    # 4 passes would cost an hour for no extra signal.
    reps = int(os.environ.get("SPARK_GRAFT_PIA_REPS", "3"))
    if reps <= 0:
        t0 = time.monotonic()
        plan.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0
    plan.write.format("noop").mode("overwrite").save()
    ws = []
    for _ in range(reps):
        t0 = time.monotonic()
        plan.write.format("noop").mode("overwrite").save()
        ws.append(time.monotonic() - t0)
    return sorted(ws)[len(ws) // 2]


def main() -> None:
    from entity_resolver_spark import datagen
    from entity_resolver_spark.config import EngineConfig
    from entity_resolver_spark.operators.blocking import candidate_pairs
    from entity_resolver_spark.operators.features import pair_inputs, text_vectors
    from entity_resolver_spark.operators.transcripts import build_entity_records
    from entity_resolver_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_entities = int(os.environ.get("SPARK_GRAFT_PIA_ENTITIES", "72000"))
    subs = sys.argv[1:] or ["join", "tax", "cosine", "kmv", "full", "staged"]
    spark = get_spark(
        "pair-inputs-ab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.range(1000).count()

    stage_dir = os.path.join(REPO, ".benchtmp", f"pia{n_entities}")
    paths = {k: os.path.join(stage_dir, k) for k in ("records", "pairs")}
    if not all(os.path.exists(p) for p in paths.values()):
        t0 = time.monotonic()
        data = datagen.generate(
            n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
        )
        transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
        records = build_entity_records(transcripts).localCheckpoint()
        records.write.mode("overwrite").parquet(paths["records"])
        pairs = candidate_pairs(records, EngineConfig()).localCheckpoint()
        pairs.write.mode("overwrite").parquet(paths["pairs"])
        print(f"staged {stage_dir} in {time.monotonic() - t0:.1f}s", file=sys.stderr)

    records = spark.read.parquet(paths["records"]).localCheckpoint()
    n_records = records.count()
    pairs = spark.read.parquet(paths["pairs"]).localCheckpoint()
    n_pairs = pairs.count()
    cfg = EngineConfig()
    vectors = text_vectors(records, cfg).localCheckpoint()
    vectors.count()

    full = pair_inputs(pairs, records, cfg, vectors=vectors)
    scalar_cols = [
        "left", "right", "l_name_key", "r_name_key",
        "l_birth_year", "l_death_year", "r_birth_year", "r_death_year",
    ]
    plans = {
        "join": full.select(*scalar_cols),
        "tax": full.select(*scalar_cols, "taxonomy_dissimilarity"),
        "cosine": full.select(*scalar_cols, "text_cosine"),
        "kmv": full.select(*scalar_cols, "text_jaccard"),
        "full": full,
    }

    # Native-expression variants: rebuild the side join exposing the raw
    # vector/sketch columns (pair_inputs only outputs the computed doubles).
    from entity_resolver_spark.functions.hashing import (
        kmv_jaccard_expr,
        kmv_sketch_expr,
        sparse_cosine_expr,
    )

    # Probe side carries the SAME columns production pair_inputs broadcasts
    # (_SIDE_COLS + sketch + vector) so side_parquet_mb measures the shipped
    # relation, not a narrowed projection (r5 advisor: the old probe omitted
    # birth/death years and categories and under-counted the footprint).
    from entity_resolver_spark.operators.features import _SIDE_COLS

    side = records.select(
        *_SIDE_COLS,
        kmv_sketch_expr(
            F.col("tokens"), cfg.shingle_k, cfg.shingle_sketch_k
        ).alias("_sketch"),
    ).join(
        vectors.select(
            F.col("text_hash").alias("_vt"),
            F.col("name_hash").alias("_vn"),
            "vector",
        ),
        (F.col("text_hash") == F.col("_vt"))
        & F.col("name_hash").eqNullSafe(F.col("_vn")),
        "left",
    ).drop("_vt", "_vn")
    if n_records <= cfg.broadcast_max_records:
        side = F.broadcast(side)
    joined = (
        pairs.join(side.alias("L"), F.col("left") == F.col("L.conv_id"))
        .join(side.alias("R"), F.col("right") == F.col("R.conv_id"))
    )
    plans["cosnat"] = joined.select(
        "left", "right",
        F.when(
            F.col("L.text_hash") == F.col("R.text_hash"), F.lit(1.0)
        ).otherwise(
            F.coalesce(
                sparse_cosine_expr(F.col("L.vector"), F.col("R.vector")),
                F.lit(0.5),
            )
        ).alias("text_cosine"),
    )
    plans["kmvnat"] = joined.select(
        "left", "right",
        F.when(
            F.col("L.text_hash") == F.col("R.text_hash"), F.lit(1.0)
        ).otherwise(
            F.coalesce(
                kmv_jaccard_expr(
                    F.col("L._sketch"), F.col("R._sketch"), cfg.shingle_sketch_k
                ),
                F.lit(0.0),
            )
        ).alias("text_jaccard"),
    )
    # Crossover A/B: the same full pair_inputs plan with the join strategy
    # FORCED each way (broadcast_dims=True/False), regardless of the
    # auto-select cap — measures the actual cost cliff at this corpus size.
    plans["full_bcast"] = pair_inputs(
        pairs, records, cfg, vectors=vectors, broadcast_dims=True
    )
    plans["full_shuf"] = pair_inputs(
        pairs, records, cfg, vectors=vectors, broadcast_dims=False
    )

    out = {"cpus": cpus, "n_entities": n_entities,
           "n_records": n_records, "n_pairs": n_pairs}
    for name in subs:
        if name == "sidesize":
            # Serialized footprint of the per-record side table (attrs ⋈
            # vectors): what a broadcast of it actually ships. Parquet bytes
            # under-count the in-memory hash relation ~3-5x; both are
            # reported for the byte-budget crossover.
            sp = os.path.join(stage_dir, "_side_probe")
            side.write.mode("overwrite").parquet(sp)
            pq = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(sp) for f in fs
            )
            out["side_parquet_mb"] = round(pq / 1e6, 1)
            out["side_rows"] = n_records
            continue
        if name == "staged_out":
            # The pre-r5 bench shape: range exchange on the OUTPUT — the
            # bounds-sampling job recomputes the whole UDF child once more.
            score_tasks = max(cpus, min(4 * cpus, 1 + n_pairs // 65536))
            t0 = time.monotonic()
            ck = (
                pair_inputs(pairs, records, cfg, vectors=vectors)
                .repartitionByRange(score_tasks, "left", "right")
                .localCheckpoint()
            )
            ck.count()
            out["staged_out_s"] = round(time.monotonic() - t0, 3)
            ck.unpersist()
            continue
        if name == "staged":
            # The bench shape: range exchange on the cheap checkpointed
            # pairs input; the broadcast join + select inherit the layout.
            score_tasks = max(cpus, min(4 * cpus, 1 + n_pairs // 65536))
            t0 = time.monotonic()
            ck = pair_inputs(
                pairs.repartitionByRange(score_tasks, "left", "right"),
                records,
                cfg,
                vectors=vectors,
            ).localCheckpoint()
            ck.count()
            out["staged_s"] = round(time.monotonic() - t0, 3)
            ck.unpersist()
            continue
        out[f"{name}_s"] = round(steady(plans[name]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
