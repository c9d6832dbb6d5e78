"""Structured Streaming ingest: watermarked stats + incremental record fold."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from entity_resolver_spark import datagen
from entity_resolver_spark.sources.catalog import Warehouse
from entity_resolver_spark.streaming.ingest import (
    incremental_records_sink,
    read_transcript_stream,
    streaming_conversation_stats,
)


@pytest.fixture(scope="module")
def stream_dirs(spark, corpus, tmp_path_factory):
    """Split the corpus transcripts into two parquet 'drops'."""
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "in")
    os.makedirs(src, exist_ok=True)
    pdf = corpus["transcripts"]
    convs = sorted(pdf["conv_id"].unique())
    half = set(convs[: len(convs) // 2])
    first = pdf[pdf["conv_id"].isin(half)]
    second = pdf[~pdf["conv_id"].isin(half)]
    datagen.to_spark(spark, first.reset_index(drop=True)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "drop1"))
    datagen.to_spark(spark, second.reset_index(drop=True)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "drop2"))
    return root, src


def test_streaming_stats_counts_all_turns(spark, corpus, stream_dirs, tmp_path):
    root, src = stream_dirs
    stream = read_transcript_stream(spark, os.path.join(src, "*"))
    agg = streaming_conversation_stats(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("conv_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select sum(n_turns) as n from conv_stats"
        ).collect()[0]["n"]
        assert got == len(corpus["transcripts"])
    finally:
        q.stop()


def test_incremental_record_fold_matches_batch(spark, corpus, transcripts, stream_dirs, tmp_path):
    """Feeding the stream drop-by-drop through foreachBatch must converge to
    the same records table a batch run produces (per-turn equality)."""
    from entity_resolver_spark.operators.transcripts import build_entity_records

    root, src = stream_dirs
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sink = incremental_records_sink(wh)
    stream = read_transcript_stream(spark, os.path.join(src, "*"), max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = (
        wh.read("records")
        .select("conv_id", "full_text", "name_key")
        .orderBy("conv_id")
        .collect()
    )
    expect = (
        build_entity_records(transcripts)
        .select("conv_id", "full_text", "name_key")
        .orderBy("conv_id")
        .collect()
    )
    assert got == expect
