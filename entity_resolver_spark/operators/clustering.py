"""Stage 5 — transitive closure via iterative large-star / small-star.

The reference clusters with a driver-memory BFS over the match graph
(/root/reference/src/classifying.py:2184-2284, edges filtered at
min_edge_confidence 0.65). That caps at what one Python process holds. Here we
run the alternating large-star/small-star connected-components algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SOCC'14)
directly on the edges DataFrame — O(log n) rounds, each round two
shuffle-aggregations, lineage truncated by ``localCheckpoint`` per round so
the plan doesn't grow with iterations.

Node ids are hashed to longs for cheap min() comparisons; the string ids are
restored by a final join.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolver_spark.config import MIN_EDGE_CONFIDENCE


def _with_nbr_min(nbrs: DataFrame) -> DataFrame:
    """Attach m = min(v) over u's neighborhood (clamped by u itself) to every
    (u, v) row — the kernel both stars share.

    Two-level min, celebrity-safe: the per-u minimum comes from a
    ``groupBy(u).agg(min(v))`` whose map-side partial aggregation reduces the
    shuffle to ONE row per (mapper, u) — a node of any degree never funnels
    its neighborhood through one reduce task to compute the min. The tiny min
    table then joins back onto the neighbor rows. A ``Window.partitionBy(u)``
    (the previous form) instead BUFFERS the entire hottest neighborhood in a
    single task's WindowExec — star graphs start exactly that way (a
    celebrity node holds its whole component as direct neighbors), so the
    buffered form is the non-scalable shape even though degrees shrink as
    rounds progress. The join still places all of u's rows in one partition,
    but it streams them (sort-merge over a 1-row-per-key build side) rather
    than materializing them.
    """
    mins = nbrs.groupBy("u").agg(F.min("v").alias("_mn"))
    return nbrs.join(mins, "u").select(
        "u", "v", F.least(F.col("_mn"), F.col("u")).alias("m")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's min neighborhood
    label (including u itself)."""
    nbrs = edges.select("u", "v").union(edges.select(F.col("v"), F.col("u")))
    return (
        _with_nbr_min(nbrs)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u to the min label."""
    # orient edges so u >= v
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    withm = _with_nbr_min(oriented)
    out = withm.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        withm.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame, max_iter: int = 50, reliable_every: int = 0
) -> DataFrame:
    """edges(src: string, dst: string) -> (id: string, component: string).

    component = lexicographically-minimal member id of the node's component
    (deterministic cluster labels). Nodes present only as self-edges are fine;
    isolated nodes should be appended by the caller (see ``cluster_records``).

    ``reliable_every``: every K rounds, cut lineage with a RELIABLE
    ``checkpoint()`` (requires ``sparkContext.setCheckpointDir``) instead of
    ``localCheckpoint()``. localCheckpoint stores blocks on executors only —
    on a real cluster an executor loss mid-loop kills the job; reliable
    checkpoints land on the checkpoint filesystem and survive. 0 (default)
    keeps the pure local-mode fast path; at cluster scale pass e.g. 5.
    """
    # Cut the caller's lineage once up front: the function scans `edges`
    # several times (node map, edge relabeling) and an iterative algorithm
    # must never re-evaluate an arbitrary upstream plan per scan.
    edges = edges.select("src", "dst").localCheckpoint()
    sess = edges.sparkSession
    if reliable_every and sess.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "reliable_every requires sparkContext.setCheckpointDir(...)"
        )
    ids = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # dense long surrogate via xxhash64 (collision over 64 bits is negligible
    # and would only merge two clusters; ids are restored by join at the end)
    node_map = ids.select(F.col("id"), F.xxhash64("id").alias("nid")).persist()
    e = (
        edges.join(node_map.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("nid", "u")
        .join(node_map.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("nid", "v")
        .select("u", "v")
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # The loop runs in a CHILD session (same SparkContext, private SQL conf):
    # shuffle sizing and the AQE toggle below must not leak into — or race
    # with — concurrent queries on the caller's session. The materialized
    # edges cross sessions via a GLOBAL temp view — a logical-plan handle
    # over the already-checkpointed blocks, no data movement and no Python
    # row round-trip (df.rdd -> createDataFrame would deserialize every row
    # through the Python worker).
    spark = sess.newSession()
    n_edges = e.count()
    view = f"er_cc_edges_{uuid.uuid4().hex}"
    e.createOrReplaceGlobalTempView(view)
    e = spark.table(f"global_temp.{view}")
    # Size the loop's shuffles to the edge volume: each round is several tiny
    # shuffles, and running them at the session default (sized for the full
    # corpus) pays per-task overhead x partitions x rounds for nothing. The
    # match graph is orders of magnitude smaller than the pair set.
    default_parts = int(sess.conf.get("spark.sql.shuffle.partitions"))
    loop_parts = max(4, min(default_parts, n_edges // 100_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    # AQE's per-stage runtime re-planning (extra jobs, statistics collection,
    # plan re-optimization on the single-threaded driver) is pure overhead
    # for a loop whose shuffles are already sized explicitly — measured ~40%
    # of the per-round wall at small edge counts. Child-session-scoped.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if loop_parts < default_parts:
        e = e.coalesce(loop_parts).localCheckpoint()
    out_view = f"er_cc_out_{uuid.uuid4().hex}"
    try:
        prev_sig = None
        for rnd in range(max_iter):
            # one lineage cut per round: large-star feeds small-star
            # unmaterialized; reliable checkpoint every K rounds if configured
            e = _small_star(_large_star(e))
            if reliable_every and (rnd + 1) % reliable_every == 0:
                e = e.checkpoint()
            else:
                e = e.localCheckpoint()
            sig = e.agg(
                F.count(F.lit(1)).alias("n"),
                # decimal sum: ANSI-safe (long sum of 64-bit hashes overflows)
                F.coalesce(
                    F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
                ).alias("h"),
            ).collect()[0]
            cur_sig = (sig["n"], str(sig["h"]))
            if cur_sig == prev_sig:
                break
            prev_sig = cur_sig
        # hand the converged star forest back to the caller's session the same
        # way (the final loop round left it checkpointed)
        e.createOrReplaceGlobalTempView(out_view)
        e = sess.table(f"global_temp.{out_view}")
        # After convergence, small-star output is a star forest: u -> root.
        # The root is the hash-order minimum; relabel with the
        # lexicographically minimal member id so cluster labels are
        # deterministic AND meaningful in id space (one extra groupBy on
        # component-count rows). The result is eagerly materialized
        # (localCheckpoint) BEFORE the finally block drops the temp views —
        # the returned plan must not reference a dropped view, and dropping
        # them unpins the loop's converged edge blocks from executor storage
        # (long-lived sessions running repeated incremental closures would
        # otherwise accumulate one pinned edge set + view per call).
        roots = e.select(F.col("u").alias("nid"), F.col("v").alias("root_nid"))
        labeled = node_map.join(roots, "nid", "left").select(
            "id", F.coalesce("root_nid", "nid").alias("root_nid")
        )
        names = labeled.groupBy("root_nid").agg(F.min("id").alias("component"))
        out = labeled.join(names, "root_nid").select("id", "component")
        out = out.localCheckpoint()
    finally:
        sess.catalog.dropGlobalTempView(view)
        sess.catalog.dropGlobalTempView(out_view)
        node_map.unpersist()
    return out


def cluster_records(
    records: DataFrame,
    scored: DataFrame,
    min_edge_confidence: float = MIN_EDGE_CONFIDENCE,
    reliable_every: int = 0,
) -> DataFrame:
    """Strict clustering (reference _generate_clusters_strict,
    src/classifying.py:2184-2284): filter edges by confidence, run CC, append
    singletons (records with no surviving edge form their own cluster).

    ``reliable_every`` is forwarded to ``connected_components`` — the
    pipeline threads ``EngineConfig.cc_reliable_every`` through here so
    cluster deployments get fault-tolerant lineage cuts (see that config
    knob and scripts/submit_job.py --checkpoint-dir)."""
    edges = scored.where(
        F.col("is_match") & (F.col("proba") >= F.lit(min_edge_confidence))
    ).select(F.col("left").alias("src"), F.col("right").alias("dst"))
    comp = connected_components(edges, reliable_every=reliable_every)
    all_ids = records.select(F.col("conv_id").alias("id"))
    return all_ids.join(comp, "id", "left").select(
        F.col("id").alias("conv_id"),
        F.coalesce("component", "id").alias("cluster_id"),
    )


def cluster_stats(clusters: DataFrame) -> DataFrame:
    """Cluster size distribution (reference reports sizes/averages,
    src/classifying.py:2277-2282)."""
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.max("size").alias("max_size"),
        F.avg("size").alias("avg_size"),
        F.sum((F.col("size") == 1).cast("int")).alias("n_singletons"),
    )
