"""Candidate-config evaluation for blocking-pass pruning: pair volume,
blocking recall, and hot-split forgone-TRUE-pair count per EngineConfig
variant at one corpus size. Companion to scripts/blocking_audit.py (which
measures per-pass leave-one-out marginals); this script measures WHOLE
candidate profiles so pass interactions are captured — dropping two passes
can lose more recall than the sum of their marginals when their unique sets
overlap.

Usage: python scripts/prune_eval.py [n_entities]
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from entity_resolver_spark import datagen  # noqa: E402
from entity_resolver_spark.config import EngineConfig  # noqa: E402
from entity_resolver_spark.operators import blocking as B  # noqa: E402
from entity_resolver_spark.operators.transcripts import build_entity_records  # noqa: E402
from entity_resolver_spark.session import get_spark  # noqa: E402

BASE = EngineConfig()

CANDIDATES: dict[str, EngineConfig] = {
    "default": BASE,
    "-xkey": replace(BASE, exact_plain_enabled=False),
    "blockcap48": replace(BASE, max_block_size=48),
    "blockcap32": replace(BASE, max_block_size=32),
    "-xkey blockcap32": replace(
        BASE, exact_plain_enabled=False, max_block_size=32
    ),
}


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 72000
    spark = get_spark("prune-eval")
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(32)
    labeled = spark.createDataFrame(data["labeled_pairs"])
    records = build_entity_records(transcripts).localCheckpoint()
    n_rec = records.count()
    truths = (
        labeled.where(F.col("match"))
        .select(
            F.least("left", "right").alias("left"),
            F.greatest("left", "right").alias("right"),
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    n_truth = truths.count()
    print(f"=== corpus: {n_entities} entities, {n_rec} records, "
          f"{n_truth} true pairs ===", flush=True)
    for name, cfg in CANDIDATES.items():
        t0 = time.monotonic()
        blocks = B.all_blocks(records, cfg).localCheckpoint()
        pairs = B.pairs_from_blocks(
            B.split_hot_blocks(blocks, cfg, materialized=True)
        ).localCheckpoint()
        n = pairs.count()
        cov = truths.join(pairs, ["left", "right"], "left_semi").count()
        wall = time.monotonic() - t0
        print(
            f"{name:24s} pairs={n:>10d} ({n / n_rec:5.1f}/rec) "
            f"recall={cov / n_truth:.5f} missed={n_truth - cov:>5d} "
            f"wall={wall:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
