"""Per-phase breakdown of connected_components at bench scale (guide §1).

Replicates operators/clustering.connected_components with timers around each
phase and each loop round, on the same edge set er_cluster sees in bench.py.
"""

from __future__ import annotations

import os
import sys
import time
import uuid

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from entity_resolver_spark import datagen
    from entity_resolver_spark.operators import clustering as CL
    from entity_resolver_spark.operators.blocking import candidate_pairs
    from entity_resolver_spark.operators.features import (
        features_from_inputs, pair_inputs, text_vectors,
    )
    from entity_resolver_spark.config import EngineConfig
    from entity_resolver_spark.operators.scoring import Model, score_pairs
    from entity_resolver_spark.operators.transcripts import build_entity_records
    from entity_resolver_spark.session import get_spark

    spark = get_spark("profile-cc", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.range(1000).count()
    data = datagen.generate(n_entities=2000, convs_per_entity=(2, 5),
                            turns_per_conv=(3, 12))
    transcripts = (datagen.to_spark(spark, data["transcripts"])
                   .repartition(max(cpus, 8)).localCheckpoint())
    records = build_entity_records(transcripts).drop(
        "full_text", "norm_text", "first_turn", "name_raw").localCheckpoint()
    pairs = candidate_pairs(records).localCheckpoint()
    vectors = text_vectors(records, EngineConfig()).localCheckpoint()
    inputs = pair_inputs(pairs, records, vectors=vectors).localCheckpoint()
    model = Model.default()
    scored = score_pairs(features_from_inputs(inputs), model).persist()
    scored.count()

    def t(label, fn):
        t0 = time.monotonic()
        out = fn()
        print(f"  {label}: {time.monotonic()-t0:.3f}s", flush=True)
        return out

    for rep in range(2):
        print(f"== cluster_records replica, rep {rep} ==")
        T0 = time.monotonic()
        edges0 = scored.where(
            F.col("is_match") & (F.col("proba") >= F.lit(model.edge_threshold))
        ).select(F.col("left").alias("src"), F.col("right").alias("dst"))

        edges = t("edges_ckpt", lambda: edges0.select("src", "dst").localCheckpoint())
        sess = edges.sparkSession
        ids = (edges.select(F.col("src").alias("id"))
               .union(edges.select(F.col("dst").alias("id"))).distinct())
        node_map = ids.select(F.col("id"), F.xxhash64("id").alias("nid")).persist()
        e = t("e_build_ckpt", lambda: (
            edges.join(node_map.withColumnRenamed("id", "src"), "src")
            .withColumnRenamed("nid", "u")
            .join(node_map.withColumnRenamed("id", "dst"), "dst")
            .withColumnRenamed("nid", "v")
            .select("u", "v").where(F.col("u") != F.col("v"))
            .distinct().localCheckpoint()))
        spark2 = sess.newSession()
        n_edges = t("count", lambda: e.count())
        print(f"  n_edges={n_edges}")
        view = f"er_cc_edges_{uuid.uuid4().hex}"
        e.createOrReplaceGlobalTempView(view)
        e = spark2.table(f"global_temp.{view}")
        default_parts = int(sess.conf.get("spark.sql.shuffle.partitions"))
        loop_parts = max(4, min(default_parts, n_edges // 100_000 + 1))
        spark2.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        spark2.conf.set("spark.sql.adaptive.enabled", "false")
        if loop_parts < default_parts:
            e = t("coalesce_ckpt", lambda: e.coalesce(loop_parts).localCheckpoint())
        prev_sig = None
        for rnd in range(50):
            tr = time.monotonic()
            e = CL._small_star(CL._large_star(e)).localCheckpoint()
            tc = time.monotonic()
            sig = e.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                           F.lit(0)).alias("h")).collect()[0]
            cur = (sig["n"], str(sig["h"]))
            print(f"  round {rnd}: stars+ckpt {tc-tr:.3f}s, sig {time.monotonic()-tc:.3f}s, n={sig['n']}")
            if cur == prev_sig:
                break
            prev_sig = cur
        out_view = f"er_cc_out_{uuid.uuid4().hex}"
        e.createOrReplaceGlobalTempView(out_view)
        e2 = sess.table(f"global_temp.{out_view}")
        roots = e2.select(F.col("u").alias("nid"), F.col("v").alias("root_nid"))
        labeled = node_map.join(roots, "nid", "left").select(
            "id", F.coalesce("root_nid", "nid").alias("root_nid"))
        names = labeled.groupBy("root_nid").agg(F.min("id").alias("component"))
        out = labeled.join(names, "root_nid").select("id", "component")
        out = t("final_label_ckpt", lambda: out.localCheckpoint())
        sess.catalog.dropGlobalTempView(view)
        sess.catalog.dropGlobalTempView(out_view)
        node_map.unpersist()
        all_ids = records.select(F.col("conv_id").alias("id"))
        clusters = all_ids.join(out, "id", "left").select(
            F.col("id").alias("conv_id"),
            F.coalesce("component", "id").alias("cluster_id"))
        t("distinct_count", lambda: clusters.select("cluster_id").distinct().count())
        print(f"  TOTAL: {time.monotonic()-T0:.3f}s")


if __name__ == "__main__":
    main()
