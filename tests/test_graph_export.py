"""GraphML export: bounded sampling + attribute round-trip."""

from __future__ import annotations

import networkx as nx

from entity_resolver_spark.sources.graph_export import sample_edges, write_graphml


def test_write_graphml_roundtrip(spark, tmp_path):
    scored = spark.createDataFrame(
        [("a", "b", 0.91, True), ("b", "c", 0.72, True), ("c", "d", 0.4, False)],
        ["left", "right", "proba", "is_match"],
    )
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d")], ["conv_id", "cluster_id"]
    )
    path = str(tmp_path / "g.graphml")
    n = write_graphml(scored, clusters, path)
    assert n == 2
    g = nx.read_graphml(path)
    assert set(g.nodes) == {"a", "b", "c"}
    assert g.nodes["b"]["cluster_id"] == "a"
    assert abs(g.edges["a", "b"]["confidence"] - 0.91) < 1e-9


def test_edge_sampling_bounds(spark):
    rows = [(f"n{i}", f"m{i}", 0.9, True) for i in range(2000)]
    scored = spark.createDataFrame(rows, ["left", "right", "proba", "is_match"])
    sampled = sample_edges(scored, max_edges=500).count()
    assert sampled <= 700  # hash sampling: close to the cap, never the full set
    assert sampled >= 300
    # deterministic
    assert sample_edges(scored, max_edges=500).count() == sampled
