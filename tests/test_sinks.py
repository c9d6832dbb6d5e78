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


def test_warehouse_iceberg_mode_jar_gated(spark, tmp_path):
    """Iceberg-mode Warehouse commits (the north-rule storage layer),
    executed when the Iceberg Spark runtime is on the classpath and SKIPPED
    otherwise — this sandbox ships no Iceberg jars, so the parquet
    two-rename path (exercised by every pipeline test) is the fallback."""
    import pytest as _pytest

    from entity_resolver_spark.sources.catalog import Warehouse

    confs = {
        "spark.sql.catalog.icetest": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.icetest.type": "hadoop",
        "spark.sql.catalog.icetest.warehouse": str(tmp_path / "ice"),
    }
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        try:
            spark.sql("CREATE NAMESPACE IF NOT EXISTS icetest.er")
        except Exception as exc:  # jar-gated: no Iceberg runtime here
            _pytest.skip(f"Iceberg runtime not on classpath ({type(exc).__name__})")
        wh = Warehouse(spark, str(tmp_path / "wh"), namespace="icetest.er")
        assert wh.use_iceberg
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        stats = wh.write("t1", df)
        assert stats["rows"] == 2
        assert wh.exists("t1")
        got = {r["id"]: r["s"] for r in wh.read("t1").collect()}
        assert got == {1: "a", 2: "b"}
        # replace is atomic snapshot commit
        wh.write("t1", spark.createDataFrame([(3, "c")], "id int, s string"))
        assert wh.read("t1").count() == 1
    finally:
        for k in confs:
            spark.conf.unset(k)
