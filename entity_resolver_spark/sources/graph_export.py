"""GraphML export of the match graph (reference S10).

Reference parity: /root/reference/src/classifying.py:2927-3335 — in-memory
and streaming GraphML writers with edge sampling for very large graphs
(config.yml:255-261). Here: deterministic edge sampling happens
DISTRIBUTED (filter on a hash of the canonical pair — no driver-side
reservoirs), then the bounded sample is collected and written via networkx
(import-gated; this is a visualization artifact, not a pipeline stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_edges(scored: DataFrame, max_edges: int = 50_000) -> DataFrame:
    """Deterministic hash-based edge sample of the match graph, bounded to
    ~max_edges (reference samples edges for big graphs; ours never collects
    more than the cap to the driver)."""
    edges = scored.where(F.col("is_match")).select(
        F.col("left"), F.col("right"), F.round("proba", 6).alias("confidence")
    )
    n = edges.count()
    if n <= max_edges:
        return edges
    keep = max_edges / n
    bucket = F.pmod(F.xxhash64("left", "right"), F.lit(1_000_000))
    return edges.where(bucket < int(keep * 1_000_000))


def write_graphml(
    scored: DataFrame,
    clusters: DataFrame,
    path: str,
    max_edges: int = 50_000,
) -> int:
    """Write the (sampled) match graph with cluster-id node attributes.
    Returns the number of edges written."""
    try:
        import networkx as nx
    except ImportError as exc:  # pragma: no cover
        raise ImportError("GraphML export needs networkx") from exc

    edge_rows = sample_edges(scored, max_edges).collect()
    touched = {r["left"] for r in edge_rows} | {r["right"] for r in edge_rows}
    cluster_of = {
        r["conv_id"]: r["cluster_id"]
        for r in clusters.where(F.col("conv_id").isin(list(touched))).collect()
    } if touched else {}
    g = nx.Graph()
    for r in edge_rows:
        g.add_edge(r["left"], r["right"], confidence=float(r["confidence"]))
    nx.set_node_attributes(
        g, {n: cluster_of.get(n, n) for n in g.nodes}, "cluster_id"
    )
    nx.write_graphml(g, path)
    return g.number_of_edges()
