"""End-to-end resolution pipeline: normalize -> block -> score -> cluster.

The reference's orchestrator runs an ordered stage list with a state tracker
and per-stage checkpoints (/root/reference/src/orchestrating.py:70-84,
src/checkpoint_manager.py:100-158). Here each stage is a DataFrame plan whose
output commits to a Warehouse table; a resumed run skips completed stages
(stage-level resume) and the scoring stage additionally skips already-scored
pairs via a left_anti join against its committed output (pair-level resume,
the analogue of the reference's processed_ids checkpoint,
src/classifying.py:717).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.operators.blocking import (
    all_blocks,
    pairs_from_blocks,
    split_hot_blocks,
)
from entity_resolver_spark.operators.clustering import cluster_records
from entity_resolver_spark.operators.features import pair_features, text_vectors
from entity_resolver_spark.operators.scoring import Model, score_pairs
from entity_resolver_spark.operators.transcripts import (
    build_entity_records,
    string_stats,
)
from entity_resolver_spark.sources.catalog import Warehouse

STAGES = ["records", "vectors", "pairs", "scored", "clusters"]


@dataclass
class PipelineResult:
    clusters: DataFrame
    metrics: list[dict]


class ResolutionPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        cfg: EngineConfig | None = None,
        model: Model | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.model = model or Model.default()
        self.wh = Warehouse(spark, warehouse_dir)
        self.metrics: list[dict] = []

    # ------------------------------------------------------------------
    def _run_stage(self, name: str, build, resume: bool) -> DataFrame:
        state = self.wh.load_state()
        if resume and name in state["completed"] and self.wh.exists(name):
            return self.wh.read(name)
        t0 = time.monotonic()
        df = build()
        stats = self.wh.write(name, df)
        row = {"stage": name, **stats, "total_ms": int((time.monotonic() - t0) * 1000)}
        self.metrics.append(row)
        self.wh.append_metrics([row])
        state = self.wh.load_state()
        if name not in state["completed"]:
            state["completed"].append(name)
        state["stages"][name] = row
        self.wh.save_state(state)
        return self.wh.read(name)

    # ------------------------------------------------------------------
    def run(self, transcripts: DataFrame, resume: bool = True) -> PipelineResult:
        cfg = self.cfg

        records = self._run_stage(
            "records", lambda: build_entity_records(transcripts), resume
        )

        vectors = self._run_stage(
            "vectors", lambda: text_vectors(records, cfg), resume
        )

        def build_pairs() -> DataFrame:
            blocks = split_hot_blocks(all_blocks(records, cfg), cfg)
            return pairs_from_blocks(blocks)

        pairs = self._run_stage("pairs", build_pairs, resume)

        def build_scored() -> DataFrame:
            todo = pairs
            # pair-level resume: skip pairs already scored in a partial commit
            if resume and self.wh.exists("scored_partial"):
                done = self.wh.read("scored_partial")
                todo = pairs.join(done.select("left", "right"), ["left", "right"], "left_anti")
                feats = pair_features(todo, records, cfg, vectors=vectors)
                fresh = score_pairs(feats, self.model)
                return done.unionByName(fresh)
            feats = pair_features(todo, records, cfg, vectors=vectors)
            return score_pairs(feats, self.model)

        scored = self._run_stage("scored", build_scored, resume)

        edge_t = max(cfg.min_edge_confidence, self.model.edge_threshold)
        clusters = self._run_stage(
            "clusters",
            lambda: cluster_records(records, scored, edge_t),
            resume,
        )
        return PipelineResult(clusters=clusters, metrics=self.metrics)

    # ------------------------------------------------------------------
    def write_side_tables(self, resume: bool = True) -> None:
        """Preprocessing-parity side tables (string_dict/string_counts/
        field_hash_mapping) — separate so the hot path doesn't pay for them."""
        records = self.wh.read("records")
        for name, df in string_stats(records).items():
            self._run_stage(name, lambda df=df: df, resume)


def evaluate_pairs(scored: DataFrame, labeled: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of is_match against labeled pairs that
    share a blocking key (i.e. appear in `scored`) — 'labeled pairs at
    identical blocking keys' per the north_rule. Pairs the blocker never
    produced are scored as negatives (they hurt recall), so blocking recall is
    part of the metric."""
    truths = labeled.select(
        F.least("left", "right").alias("left"),
        F.greatest("left", "right").alias("right"),
        F.col("match").cast("boolean").alias("label"),
    ).dropDuplicates(["left", "right"])
    joined = truths.join(
        scored.select("left", "right", "is_match"), ["left", "right"], "left"
    ).select(
        "label", F.coalesce("is_match", F.lit(False)).alias("pred")
    )
    counts = {
        (r["label"], r["pred"]): r["n"]
        for r in joined.groupBy("label", "pred").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    tp = counts.get((True, True), 0)
    fp = counts.get((False, True), 0)
    fn = counts.get((True, False), 0)
    tn = counts.get((False, False), 0)
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn, "precision": prec, "recall": rec, "f1": f1}
