"""Pairwise feature battery semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.functions.years import year_match_expr
from entity_resolver_spark.operators.blocking import candidate_pairs
from entity_resolver_spark.operators.features import pair_features


def test_feature_columns_and_ranges(spark, records):
    cfg = EngineConfig()
    pairs = candidate_pairs(records)
    feats = pair_features(pairs, records, cfg)
    assert set(feats.columns) == {"left", "right", *cfg.feature_cols}
    mins_maxs = feats.agg(
        *[F.min(c).alias(f"min_{c}") for c in cfg.feature_cols],
        *[F.max(c).alias(f"max_{c}") for c in cfg.feature_cols],
    ).collect()[0]
    for c in cfg.feature_cols:
        assert mins_maxs[f"min_{c}"] >= 0.0, c
        assert mins_maxs[f"max_{c}"] <= 1.0, c


def test_identical_records_score_one(spark):
    """A pair of identical conversations must hit 1.0 on every text/name
    feature (the reference's identical-hash short-circuit,
    src/feature_engineering.py:905-915)."""
    from entity_resolver_spark.operators.transcripts import build_entity_records

    rows = [
        ("p1", 0, "user", "Curie, Marie, 1867-1934. radiation isotope laboratory", None, None),
        ("p2", 0, "user", "Curie, Marie, 1867-1934. radiation isotope laboratory", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    recs = build_entity_records(df)
    pairs = spark.createDataFrame([("p1", "p2")], ["left", "right"])
    row = pair_features(pairs, recs).collect()[0]
    assert row["name_jw"] == pytest.approx(1.0)
    assert row["name_lev_sim"] == pytest.approx(1.0)
    assert row["text_cosine"] == pytest.approx(1.0)
    assert row["name_text_squared"] == pytest.approx(1.0)
    assert row["year_match"] == pytest.approx(1.0)


def test_broadcast_and_shuffle_join_paths_identical(spark, records):
    """The auto-selected broadcast fast path and the 100-TB shuffled-join
    path must produce identical feature rows (same pairs, same values)."""
    cfg = EngineConfig()
    pairs = candidate_pairs(records)
    a = pair_features(pairs, records, cfg, broadcast_dims=True)
    b = pair_features(pairs, records, cfg, broadcast_dims=False)
    cols = ["left", "right", *cfg.feature_cols]
    ra = sorted(a.select(*cols).collect(), key=lambda r: (r["left"], r["right"]))
    rb = sorted(b.select(*cols).collect(), key=lambda r: (r["left"], r["right"]))
    assert len(ra) == len(rb) and len(ra) > 0
    for x, y in zip(ra, rb):
        assert x["left"] == y["left"] and x["right"] == y["right"]
        for c in cfg.feature_cols:
            assert x[c] == pytest.approx(y[c], abs=1e-12), c


def test_year_match_semantics(spark):
    cases = [
        # (bl, dl, br, dr, expected)
        (1797, 1828, 1797, 1828, 1.0),
        (1797, 1828, 1798, 1827, 1.0),  # within tolerance 2
        (1797, 1828, 1805, 1828, 0.0),  # birth off
        (1797, None, 1797, None, 1.0),  # birth-only agreement
        (None, 1828, None, 1828, 1.0),  # death-only agreement
        (None, None, None, None, 0.0),  # no info at all -> 0.0
        (1797, None, None, 1828, 0.5),  # asymmetric -> neutral
        (1797, 1828, None, None, 0.5),  # one side empty -> neutral
    ]
    df = spark.createDataFrame(cases, "bl int, dl int, br int, dr int, exp double")
    rows = df.select(
        "exp",
        year_match_expr(F.col("bl"), F.col("dl"), F.col("br"), F.col("dr"), 2).alias("got"),
    ).collect()
    for r in rows:
        assert r["got"] == pytest.approx(r["exp"])
