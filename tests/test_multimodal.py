"""Multimodal plumbing: schema, batch shape, deterministic stub features."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolver_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    partition_by_type,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=48).cache()


def test_feature_extraction_shape(media):
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == 48
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0


def test_feature_extraction_deterministic(media):
    a = {r["media_id"]: list(r["features"]) for r in extract_features(media).collect()}
    b = {r["media_id"]: list(r["features"]) for r in extract_features(media).collect()}
    assert a == b


def test_decode_stub_off_raises(media):
    import py4j

    with pytest.raises(Exception) as exc:
        extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_partition_by_type(media):
    parts = partition_by_type(media, partitions_per_type=4)
    per_part = (
        parts.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.countDistinct("media_type").alias("n_types"))
        .collect()
    )
    # range partitioning: only boundary partitions may mix types
    mixed = sum(1 for r in per_part if r["n_types"] > 1)
    assert mixed <= 3, per_part


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    assert len(rows) > 0
    meta = {r["media_id"]: r["meta"]["duration_ms"] for r in media.where(F.col("media_type") == "video").collect()}
    from collections import Counter

    counts = Counter(r["media_id"] for r in rows)
    for mid, n in counts.items():
        expect = (meta[mid] - 1) // 500 + 1
        assert n == expect, (mid, n, expect)
