"""Warehouse: per-stage checkpoint tables with atomic commits + lineage.

The reference checkpoints stage outputs as pickles with tmp-file atomic
replace (/root/reference/src/preprocessing.py:337-352,
src/classifying.py:425-458) and tracks stage state in pipeline_state.json
(src/checkpoint_manager.py:16-185). Here every stage commits a TABLE:

* Iceberg when the runtime has the Iceberg Spark extensions on the classpath
  (``spark.sql.catalog...`` configured) — ``writeTo(...).createOrReplace()``
  gives atomic snapshots and time travel.
* Otherwise (this sandbox: no Iceberg jars) a parquet warehouse directory with
  write-to-tmp + atomic ``os.rename`` — same commit discipline, same layout.

Per-partition lineage: alongside each table a ``_lineage`` table records
(stage, partition_id, rows, committed_at_ns) so a resumed run can prove which
partitions were produced by which stage run (north_rule requirement).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession, catalog: str | None = None) -> bool:
    """True when an Iceberg catalog is configured on this session — either in
    the context SparkConf or (``catalog`` given) set at runtime on SQL conf."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        confs = []
    if any(k.startswith("spark.sql.catalog.") for k, _ in confs):
        return True
    if catalog:
        try:
            return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None
        except Exception:
            return False
    return False


class Warehouse:
    """Stage-table store rooted at a directory (parquet mode) or an Iceberg
    namespace (iceberg mode)."""

    def __init__(self, spark: SparkSession, root: str, namespace: str = "er"):
        self.spark = spark
        self.root = root
        self.namespace = namespace
        self.use_iceberg = iceberg_available(spark, namespace.split(".")[0])
        if not self.use_iceberg:
            os.makedirs(root, exist_ok=True)

    # -- paths / names -------------------------------------------------
    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _ident(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    # -- commits --------------------------------------------------------
    def write(self, table: str, df: DataFrame) -> dict:
        """Atomically (re)place ``table`` with ``df``; record lineage rows.
        Returns commit stats {rows, partitions, wall_ms}."""
        t0 = time.monotonic()
        with_pid = df.withColumn("_pid", F.spark_partition_id())
        if self.use_iceberg:
            with_pid.writeTo(self._ident(table)).createOrReplace()
            committed = self.spark.read.table(self._ident(table))
        else:
            tmp = self._path(f"_tmp_{table}_{uuid.uuid4().hex[:8]}")
            with_pid.write.mode("overwrite").parquet(tmp)
            final = self._path(table)
            # Two renames instead of rmtree-then-rename: the previously
            # committed table is moved aside first, so a crash at any point
            # leaves either the old or the new table in place (never neither);
            # the stale `.old` copy is garbage, not state — exists() keys on
            # the final path's _SUCCESS marker.
            old = final + ".old"
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(final):
                os.rename(final, old)
            os.rename(tmp, final)
            if os.path.exists(old):
                shutil.rmtree(old)
            committed = self.spark.read.parquet(final)
        lineage = (
            committed.groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(table))
            .withColumn("committed_at_ns", F.lit(time.time_ns()))
            .select("stage", F.col("_pid").alias("partition_id"), "rows", "committed_at_ns")
        )
        self._append("_lineage", lineage)
        stats = committed.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("_pid").alias("parts"),
        ).collect()[0]
        return {
            "rows": stats["rows"],
            "partitions": stats["parts"],
            "wall_ms": int((time.monotonic() - t0) * 1000),
        }

    def _append(self, table: str, df: DataFrame) -> None:
        if self.use_iceberg:
            try:
                df.writeTo(self._ident(table)).append()
            except Exception:
                df.writeTo(self._ident(table)).createOrReplace()
        else:
            df.write.mode("append").parquet(self._path(table))

    def append_metrics(self, rows: list[dict]) -> None:
        """Append stage-metrics rows to the `_metrics` table (the reference's
        telemetry sink, src/classifying.py:460-483, as a table not JSON)."""
        df = self.spark.createDataFrame(
            [
                (
                    r["stage"],
                    json.dumps(r, default=str),
                    int(r.get("rows", -1)),
                    float(r.get("wall_ms", -1)),
                    time.time_ns(),
                )
                for r in rows
            ],
            schema="stage string, payload string, rows long, wall_ms double, at_ns long",
        )
        self._append("_metrics", df)

    # -- reads ------------------------------------------------------------
    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(self._ident(table))
        p = self._path(table)
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            df = self.spark.read.table(self._ident(table))
        else:
            df = self.spark.read.parquet(self._path(table))
        return df.drop("_pid") if "_pid" in df.columns else df

    def drop(self, table: str) -> None:
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._ident(table)}")
        else:
            p = self._path(table)
            if os.path.exists(p):
                shutil.rmtree(p)

    # -- stage state (reference PipelineStateTracker) ----------------------
    def _state_path(self) -> str:
        return os.path.join(self.root, "_pipeline_state.json")

    def load_state(self) -> dict:
        p = self._state_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"completed": [], "stages": {}}

    def save_state(self, state: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, default=str)
        os.replace(tmp, self._state_path())
