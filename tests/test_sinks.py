"""Output sinks: matches CSV, detailed TSV, clusters JSON."""

from __future__ import annotations

import json
import os

from entity_resolver_spark.sources.sinks import (
    write_clusters_json,
    write_detailed_matches_tsv,
    write_matches_csv,
)


def test_sinks_roundtrip(spark, tmp_path):
    scored = spark.createDataFrame(
        [("a", "b", 0.912345678, True), ("c", "d", 0.4, False)],
        ["left", "right", "proba", "is_match"],
    )
    feats = spark.createDataFrame(
        [("a", "b", 0.9), ("c", "d", 0.1)], ["left", "right", "name_jw"]
    )
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c")], ["conv_id", "cluster_id"]
    )

    mpath = str(tmp_path / "matches")
    write_matches_csv(scored, mpath, single_file=True)
    rows = spark.read.option("header", True).csv(mpath).collect()
    assert len(rows) == 1
    assert rows[0]["entity_id1"] == "a" and rows[0]["entity_id2"] == "b"
    assert abs(float(rows[0]["confidence"]) - 0.912346) < 1e-9

    tpath = str(tmp_path / "detailed")
    write_detailed_matches_tsv(scored, feats, tpath, single_file=True)
    trows = spark.read.option("header", True).option("sep", "\t").csv(tpath).collect()
    assert len(trows) == 2 and "name_jw" in trows[0].asDict()

    jpath = str(tmp_path / "clusters")
    write_clusters_json(clusters, jpath, single_file=True)
    part = [f for f in os.listdir(jpath) if f.startswith("part-")][0]
    lines = [json.loads(l) for l in open(os.path.join(jpath, part))]
    by_id = {l["cluster_id"]: l for l in lines}
    assert by_id["a"]["members"] == ["a", "b"] and by_id["a"]["size"] == 2
