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


def test_decode_retry_queue(spark):
    """C3 analogue: rows whose decode raises become failed lineage rows with
    the error class + attempt; retry_failed re-drives exactly those keys and
    increments attempt; attempt-capped rows are left alone."""
    from entity_resolver_spark.operators.multimodal import (
        extract_features_with_lineage,
        retry_failed,
        synth_media,
    )

    media = synth_media(spark, n=30).cache()

    def flaky(payload):
        # deterministic: payload lengths are 128 + (i%5)*64 -> fail 2 of 5
        if payload is not None and len(payload) % 128 == 0:
            raise ValueError("corrupt frame header")
        import numpy as np
        return np.zeros(4, dtype="float32")

    first = extract_features_with_lineage(media, decoder=flaky, dim=4).cache()
    ok1 = first.where(F.col("status") == "ok")
    bad1 = first.where(F.col("status") == "failed")
    n_ok1, n_bad1 = ok1.count(), bad1.count()
    assert n_bad1 > 0 and n_ok1 + n_bad1 == 30
    errs = {r["error"] for r in bad1.select("error").distinct().collect()}
    assert errs == {"ValueError: corrupt frame header"}
    assert {r["attempt"] for r in first.select("attempt").distinct().collect()} == {1}

    # retry with a fixed decoder: every failed key succeeds at attempt 2
    second = retry_failed(media, first, decoder=None, dim=4).cache()
    assert second.count() == n_bad1
    assert second.where(F.col("status") == "ok").count() == n_bad1
    assert {r["attempt"] for r in second.select("attempt").distinct().collect()} == {2}
    # retried keys are exactly the failed ones
    assert second.join(bad1.select("media_id"), "media_id", "left_anti").count() == 0

    # attempt-capped rows are not re-driven
    assert retry_failed(media, second.withColumn("status", F.lit("failed")),
                        max_attempts=2).count() == 0
