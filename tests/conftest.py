"""Shared Spark session + tiny deterministic corpus for all tests."""

from __future__ import annotations

import pytest

from entity_resolver_spark import datagen
from entity_resolver_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "er-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.local.dir": "/tmp/spark-local-tests"},
    )
    yield s


@pytest.fixture(scope="session")
def corpus():
    """Tiny corpus (FIXTURES.md 'tiny' scale): 20 entities, ~60 convs."""
    return datagen.generate(n_entities=20, seed=42)


@pytest.fixture(scope="session")
def transcripts(spark, corpus):
    return datagen.to_spark(spark, corpus["transcripts"]).cache()


@pytest.fixture(scope="session")
def labeled(spark, corpus):
    return spark.createDataFrame(corpus["labeled_pairs"]).cache()


@pytest.fixture(scope="session")
def records(spark, transcripts):
    from entity_resolver_spark.operators.transcripts import build_entity_records

    return build_entity_records(transcripts).cache()
