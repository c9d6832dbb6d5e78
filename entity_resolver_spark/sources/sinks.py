"""Result sinks mirroring the reference's output formats.

Reference parity:
* matches CSV (entity_id1, entity_id2, confidence) with atomic tmp+rename —
  /root/reference/src/classifying.py:2727-2749 (S7)
* detailed matches TSV with per-pair feature values — :2751-2839 (S8)
* clusters JSON (cluster id -> members) — :2851-2926 (S9)
* telemetry — :460-483 (S11; handled by Warehouse._metrics)

Spark writes directories atomically via _SUCCESS markers; `single_file=True`
coalesces to one part for small, human-consumed outputs (the reference's
files are single-file by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_matches_csv(scored: DataFrame, path: str, single_file: bool = False) -> None:
    out = scored.where(F.col("is_match")).select(
        F.col("left").alias("entity_id1"),
        F.col("right").alias("entity_id2"),
        F.round("proba", 6).alias("confidence"),
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)


def write_detailed_matches_tsv(
    scored: DataFrame, features: DataFrame, path: str, single_file: bool = False
) -> None:
    out = scored.join(features, ["left", "right"]).orderBy("left", "right")
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).option("sep", "\t").csv(path)


def write_clusters_json(clusters: DataFrame, path: str, single_file: bool = False) -> None:
    """One JSON object per cluster: {cluster_id, size, members(sorted)} —
    members sorted for determinism (reference sorts members,
    src/classifying.py:2252)."""
    out = (
        clusters.groupBy("cluster_id")
        .agg(
            F.sort_array(F.collect_list("conv_id")).alias("members"),
            F.count(F.lit(1)).alias("size"),
        )
        .orderBy(F.desc("size"), "cluster_id")
    )
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").json(path)
