"""Structured Streaming ingest for transcript appends.

The reference has no streaming (SURVEY.md §2.11); its incremental story is
checkpoint/resume. This module adds the Spark-native extension: transcript
turns arriving as a stream are folded into per-conversation records with a
watermark on ``ts``, so late turns within the lateness bound still update
their conversation. Downstream (blocking/scoring/clustering) then runs in
micro-batch via ``foreachBatch`` against the same Warehouse tables the batch
pipeline uses — one code path for features and scoring in both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolver_spark.operators.transcripts import build_entity_records

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-based streaming source of transcript turns (parquet drops)."""
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_conversation_stats(turns: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """Watermarked per-conversation aggregate (append-mode friendly): turn
    counts and latest ts per conv_id window. The full ordered-concat record
    build happens in foreachBatch (stateless within a micro-batch)."""
    return (
        turns.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 hour"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("ts").alias("last_ts"),
        )
    )


def incremental_records_sink(warehouse):
    """foreachBatch callback: fold each micro-batch of turns into
    entity_records and MERGE-style upsert into the warehouse 'records' table
    (replace rows for conv_ids present in the batch — turn arrival changes a
    conversation's record, so the whole conversation is recomputed from the
    union of stored + new turns)."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if warehouse.exists("turns"):
            prior = warehouse.read("turns")
            touched = batch_df.select("conv_id").distinct()
            all_turns = prior.unionByName(batch_df).dropDuplicates(
                ["conv_id", "turn_idx"]
            )
        else:
            touched = batch_df.select("conv_id").distinct()
            all_turns = batch_df
        warehouse.write("turns", all_turns)
        # re-read the committed table: all_turns still references the
        # replaced files (a plan captures its file listing at analysis)
        all_turns = warehouse.read("turns")
        # recompute records only for touched conversations, keep the rest
        fresh = build_entity_records(
            all_turns.join(touched, "conv_id", "left_semi")
        )
        if warehouse.exists("records"):
            kept = warehouse.read("records").join(touched, "conv_id", "left_anti")
            out = kept.unionByName(fresh.select(*kept.columns))
        else:
            out = fresh
        warehouse.write("records", out)
        warehouse.append_metrics(
            [{"stage": f"stream_epoch_{epoch_id}", "rows": all_turns.count(), "wall_ms": -1}]
        )

    return fn
