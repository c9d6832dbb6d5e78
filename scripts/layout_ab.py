"""A/B the scoring-stage checkpoint LAYOUT on the real 72k bench corpus.

The 01:08 protocol window showed the round-robin 4-waves/core repartition
REGRESSING the 4N scoring leg 1.6x vs the AQE-coalesced layout it replaced.
Candidate explanations: (a) round-robin scatter destroys the pair adjacency
the per-batch factorize dedup exploits, (b) >1 task wave per core thrashes
Python workers, (c) the AQE layout was never actually starved. This script
times the identical scoring plan over the same checkpointed rows in several
layouts at one parallelism level.

Usage: SPARK_GRAFT_CPUS=8 python scripts/layout_ab.py [layout ...]
Layouts: none rr4w range4w rr1w range1w
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from entity_resolver_spark import datagen
from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.operators.blocking import candidate_pairs
from entity_resolver_spark.operators.features import (
    features_from_inputs,
    pair_inputs,
    text_vectors,
)
from entity_resolver_spark.operators.scoring import Model, score_pairs
from entity_resolver_spark.operators.transcripts import build_entity_records
from entity_resolver_spark.session import get_spark


def steady(plan) -> float:
    plan.write.format("noop").mode("overwrite").save()
    ws = []
    for _ in range(3):
        t0 = time.monotonic()
        plan.write.format("noop").mode("overwrite").save()
        ws.append(time.monotonic() - t0)
    return sorted(ws)[1]


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_entities = int(os.environ.get("SPARK_GRAFT_LAYOUT_ENTITIES", "72000"))
    layouts = sys.argv[1:] or ["none", "rr4w", "range4w", "rr1w"]
    spark = get_spark("layout-ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()

    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(
        max(cpus, 8)
    )
    records = build_entity_records(transcripts).localCheckpoint()
    records.count()
    cfg = EngineConfig()
    pairs = candidate_pairs(records).localCheckpoint()
    n_pairs = pairs.count()
    vectors = text_vectors(records, cfg).localCheckpoint()
    vectors.count()
    base = pair_inputs(pairs, records, vectors=vectors)
    model = Model.default()

    def mk(layout: str):
        if layout == "none":
            return base
        if layout == "rr4w":
            return base.repartition(4 * cpus)
        if layout == "range4w":
            return base.repartitionByRange(4 * cpus, "left", "right")
        if layout == "rr1w":
            return base.repartition(cpus)
        if layout == "range1w":
            return base.repartitionByRange(cpus, "left", "right")
        raise ValueError(layout)

    out = {"cpus": cpus, "n_pairs": n_pairs}
    for layout in layouts:
        inputs = mk(layout).localCheckpoint()
        inputs.count()
        plan = score_pairs(features_from_inputs(inputs), model)
        w = steady(plan)
        out[layout] = {
            "parts": inputs.rdd.getNumPartitions(),
            "score_s": round(w, 3),
            "pairs_per_s": round(n_pairs / w),
        }
        inputs.unpersist()
        print(json.dumps({layout: out[layout]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
