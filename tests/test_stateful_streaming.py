"""applyInPandasWithState operators: streaming seen-filter + running record."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from entity_resolver_spark.streaming.stateful import (
    streaming_conversation_state,
    streaming_seen_filter,
)


@pytest.fixture()
def doc_drops(spark, tmp_path):
    """Two parquet drops of (h, doc_id) with cross-drop duplicate hashes."""
    src = tmp_path / "in"
    os.makedirs(src, exist_ok=True)
    d1 = pd.DataFrame({"h": [1, 1, 2, 3], "doc_id": [10, 11, 20, 30]})
    d2 = pd.DataFrame({"h": [2, 4, 1], "doc_id": [21, 40, 12]})
    spark.createDataFrame(d1).coalesce(1).write.parquet(str(src / "drop1"))
    spark.createDataFrame(d2).coalesce(1).write.parquet(str(src / "drop2"))
    return str(src)


def test_streaming_seen_filter_first_sighting(spark, doc_drops, tmp_path):
    stream = (
        spark.readStream.schema("h long, doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(doc_drops, "*"))
    )
    out = streaming_seen_filter(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("seen")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    rows = {
        r["doc_id"]: (r["is_first"], r["n_seen"])
        for r in spark.sql("select * from seen").collect()
    }
    assert len(rows) == 7  # exactly one output row per input row
    # first sighting of each hash is the smallest doc_id of its first batch
    assert rows[10] == (True, 1)
    assert rows[11] == (False, 2)
    assert rows[20] == (True, 1)
    assert rows[30] == (True, 1)
    assert rows[40] == (True, 1)
    # state survived across micro-batches: drop2's h=1/h=2 rows are dups
    assert rows[12][0] is False and rows[12][1] == 3
    assert rows[21][0] is False and rows[21][1] == 2


def test_streaming_conversation_state_running_totals(spark, tmp_path):
    src = tmp_path / "turns"
    os.makedirs(src, exist_ok=True)
    d1 = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": [0, 1, 0],
            "role": ["user", "assistant", "user"],
            "text": ["hello", "hi there", "x"],
        }
    )
    d2 = pd.DataFrame(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": [2, 1],
            "role": ["user", "assistant"],
            "text": ["bye", "yo"],
        }
    )
    spark.createDataFrame(d1).coalesce(1).write.parquet(str(src / "d1"))
    spark.createDataFrame(d2).coalesce(1).write.parquet(str(src / "d2"))
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx long, role string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = streaming_conversation_state(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("convstate")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    # memory sink in update mode appends every per-batch update; the final
    # state per conv is the one with the highest running n_turns (monotonic)
    df = spark.sql("select * from convstate").toPandas()
    final = {}
    for _, r in df.sort_values("n_turns").iterrows():
        final[r["conv_id"]] = (r["n_turns"], r["last_role"], r["text_chars"])
    assert final["c1"] == (3, "user", len("hello") + len("hi there") + len("bye"))
    assert final["c2"] == (2, "assistant", len("x") + len("yo"))


def test_streaming_seen_filter_ttl_evicts_idle_keys(spark, tmp_path):
    """With state_ttl_ms set, a hash idle past the TTL is evicted and its
    next arrival counts as a first sighting again — bounded state on an
    unbounded keyspace (the 100-TB contract)."""
    import time

    src = tmp_path / "ttl_in"
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(
        pd.DataFrame({"h": [1], "doc_id": [10]})
    ).coalesce(1).write.parquet(str(src / "d1"))
    time.sleep(1.2)
    spark.createDataFrame(
        pd.DataFrame({"h": [9], "doc_id": [90]})
    ).coalesce(1).write.parquet(str(src / "d2"))
    time.sleep(1.2)
    spark.createDataFrame(
        pd.DataFrame({"h": [1], "doc_id": [11]})
    ).coalesce(1).write.parquet(str(src / "d3"))
    stream = (
        spark.readStream.schema("h long, doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = streaming_seen_filter(stream, state_ttl_ms=1)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("seen_ttl")
        .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    rows = {
        r["doc_id"]: (r["is_first"], r["n_seen"])
        for r in spark.sql("select * from seen_ttl").collect()
    }
    assert rows[10] == (True, 1)
    # h=1 was evicted during the idle batch; doc 11 is "first" again
    assert rows[11] == (True, 1)
