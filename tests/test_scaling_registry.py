"""Robust scaler, feature registry, evaluation operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolver_spark.functions.registry import build_features, register_feature
from entity_resolver_spark.operators.evaluation import (
    cluster_report,
    confusion_matrix,
    threshold_curve,
)
from entity_resolver_spark.operators.scaling import (
    FittedScaler,
    fit_grouped_scaler,
    fit_robust_scaler,
)


def test_robust_scaler_clips_and_scales(spark):
    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    scaler = fit_robust_scaler(df, ["x"], upper_percentile=0.95)
    lo, hi = scaler.bounds["x"]
    assert lo == 1.0
    assert hi == pytest.approx(np.percentile(vals, 95), abs=1e-9)
    out = [r[0] for r in scaler.transform(df).collect()]
    assert min(out) == 0.0 and max(out) == 1.0  # 100 clipped to hi
    # round-trip serialization
    again = FittedScaler.from_json(scaler.to_json())
    assert again.bounds == scaler.bounds


def test_grouped_scaler_preserves_binary(spark):
    df = spark.createDataFrame(
        [(0.1, 1.0), (0.9, 0.0), (0.5, 1.0)], ["name_jw", "year_conflict"]
    )
    scaler = fit_grouped_scaler(df, ["name_jw", "year_conflict"])
    assert scaler.bounds["year_conflict"] == (0.0, 1.0)
    out = scaler.transform(df).collect()
    assert {r["year_conflict"] for r in out} == {0.0, 1.0}  # untouched


def test_registry_custom_features(spark):
    df = spark.createDataFrame(
        [("abc", "abc", "x", "y"), ("abc", "abd", "x", "x")],
        ["l_name", "r_name", "l_tool", "r_tool"],
    )
    specs = [
        {"name": "name_lev", "type": "field_levenshtein", "field": "name"},
        {"name": "tool_eq", "type": "field_match", "field": "tool"},
        {
            "name": "combo",
            "type": "composite_feature",
            "operation": "max",
            "components": [
                {"type": "field_levenshtein", "field": "name"},
                {"type": "field_match", "field": "tool"},
            ],
        },
    ]
    rows = df.select(*build_features(specs)).collect()
    assert rows[0]["name_lev"] == 1.0 and rows[0]["tool_eq"] == 0.0
    assert rows[1]["tool_eq"] == 1.0
    assert rows[0]["combo"] == 1.0 and rows[1]["combo"] == 1.0


def test_registry_field_matrix(spark):
    """X9 analogue: compatibility matrix on a categorical field pair +
    multiply-composite to weight a similarity by it (the reference's
    title_cosine x role_score shape, feature_engineering.py:1329-1389)."""
    df = spark.createDataFrame(
        [
            ("author", "author", "abc", "abc"),
            ("author", "editor", "abc", "abc"),
            ("editor", "author", "abc", "abc"),  # symmetric lookup
            ("author", "printer", "abc", "abc"),  # unlisted -> default
        ],
        ["l_role", "r_role", "l_title", "r_title"],
    )
    matrix = {"author": {"author": 1.0, "editor": 0.7}}
    specs = [
        {"name": "role_compat", "type": "field_matrix", "field": "role",
         "matrix": matrix, "default": 0.3},
        {"name": "title_role_adjusted", "type": "composite_feature",
         "operation": "multiply",
         "components": [
             {"type": "field_levenshtein", "field": "title"},
             {"type": "field_matrix", "field": "role", "matrix": matrix,
              "default": 0.3},
         ]},
    ]
    rows = df.select("l_role", "r_role", *build_features(specs)).collect()
    got = {(r["l_role"], r["r_role"]): r for r in rows}
    assert got[("author", "author")]["role_compat"] == 1.0
    assert got[("author", "editor")]["role_compat"] == 0.7
    assert got[("editor", "author")]["role_compat"] == 0.7
    assert got[("author", "printer")]["role_compat"] == 0.3
    # title lev sim is 1.0 on identical titles, so adjusted == compat
    assert got[("author", "editor")]["title_role_adjusted"] == pytest.approx(0.7)


def test_registry_low_indicators(spark):
    """X7 family: binary low-similarity indicators with the reference's
    thresholds (lev 0.60 / JW 0.90, config.yml:303-309)."""
    df = spark.createDataFrame(
        [("schubert", "schubert"), ("schubert", "zzz")], ["l_name", "r_name"]
    )
    specs = [
        {"name": "low_lev", "type": "field_low_indicator", "field": "name",
         "metric": "levenshtein", "threshold": 0.60},
        {"name": "low_jw", "type": "field_low_indicator", "field": "name",
         "metric": "jaro_winkler", "threshold": 0.90},
    ]
    rows = df.select("r_name", *build_features(specs)).collect()
    got = {r["r_name"]: r for r in rows}
    assert got["schubert"]["low_lev"] == 0.0 and got["schubert"]["low_jw"] == 0.0
    assert got["zzz"]["low_lev"] == 1.0 and got["zzz"]["low_jw"] == 1.0


def test_registry_substitution(spark):
    register_feature("field_match", lambda l, r, p: F.lit(0.42))
    df = spark.createDataFrame([("a", "a")], ["l_x", "r_x"])
    out = df.select(
        *build_features([{"name": "m", "type": "field_match", "field": "x"}])
    ).collect()
    assert out[0]["m"] == 0.42
    # restore the builtin
    from entity_resolver_spark.functions import registry as reg

    register_feature("field_match", reg._field_match)


def test_confusion_matrix_and_curve(spark):
    scored = spark.createDataFrame(
        [("a", "b", 0.9, True), ("c", "d", 0.7, True), ("e", "f", 0.2, False)],
        ["left", "right", "proba", "is_match"],
    )
    truths = spark.createDataFrame(
        [("a", "b", True), ("c", "d", False), ("e", "f", False), ("x", "y", True)],
        ["left", "right", "match"],
    )
    cm = confusion_matrix(scored, truths).collect()[0]
    assert (cm["tp"], cm["fp"], cm["fn"], cm["tn"]) == (1, 1, 1, 1)
    curve = threshold_curve(scored, truths, step=0.25).collect()
    by_t = {round(r["threshold"], 2): r for r in curve}
    assert by_t[0.25]["tp"] == 1 and by_t[0.25]["fp"] == 1
    assert by_t[0.75]["tp"] == 1 and by_t[0.75]["fp"] == 0


def test_cluster_report(spark):
    clusters = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k2"), ("d", "k2")], ["conv_id", "cluster_id"]
    )
    expected = spark.createDataFrame(
        [("a", "e1"), ("b", "e1"), ("c", "e1"), ("d", "e2")], ["conv_id", "cluster_id"]
    )
    row = cluster_report(clusters, expected).collect()[0]
    assert row["n_clusters"] == 2 and row["n_records"] == 4
    # got pairs: {ab, cd}; true pairs: {ab, ac, bc}; correct: {ab}
    assert row["pair_precision"] == pytest.approx(0.5)
    assert row["pair_recall"] == pytest.approx(1 / 3)
