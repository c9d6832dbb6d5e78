"""Per-pass blocking audit: pair volume, solo recall, and LEAVE-ONE-OUT
marginal recall of every blocking pass on the bench corpus — the data that
decides which passes earn their shuffle cost (VERDICT r1: nothing measured
per-pass marginal recall; candidate volume was ~49 pairs/record).

Usage: python scripts/blocking_audit.py [n_entities]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from entity_resolver_spark import datagen  # noqa: E402
from entity_resolver_spark.config import EngineConfig  # noqa: E402
from entity_resolver_spark.operators import blocking as B  # noqa: E402
from entity_resolver_spark.operators.transcripts import build_entity_records  # noqa: E402
from entity_resolver_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("blocking-audit")
    cfg = EngineConfig()
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(32)
    labeled = spark.createDataFrame(data["labeled_pairs"])
    records = build_entity_records(transcripts).persist()
    records.count()

    passes = {
        "exact": lambda: B.exact_blocks(records),
        "snm": lambda: B.sorted_neighborhood_blocks(records, cfg),
        "minhash_text": lambda: B.minhash_lsh_blocks(records, cfg),
        "name_lsh": lambda: B.name_lsh_blocks(records, cfg),
        "initials": lambda: B.initials_blocks(records),
        "soundex": lambda: B.soundex_blocks(records),
    }

    def pairs_of(blocks_df):
        return B.pairs_from_blocks(B.split_hot_blocks(blocks_df, cfg)).persist()

    solo = {}
    for name, fn in passes.items():
        t0 = time.monotonic()
        p = pairs_of(fn())
        n = p.count()
        rec = B.blocking_recall(p, labeled)
        solo[name] = (n, rec, time.monotonic() - t0)
        p.unpersist()

    all_pairs = pairs_of(B.all_blocks(records, cfg))
    n_all = all_pairs.count()
    rec_all = B.blocking_recall(all_pairs, labeled)

    print(f"\n=== {n_entities} entities, {records.count()} records, "
          f"union: {n_all} pairs, recall {rec_all:.5f} ===")
    print(f"{'pass':14s} {'solo pairs':>10s} {'solo recall':>12s} "
          f"{'loo pairs':>10s} {'loo recall':>11s} {'marg recall':>12s} {'wall':>6s}")
    for name in passes:
        rest = None
        for other, fn in passes.items():
            if other == name:
                continue
            b = fn()
            rest = b if rest is None else rest.unionByName(b)
        loo = pairs_of(rest)
        n_loo = loo.count()
        rec_loo = B.blocking_recall(loo, labeled)
        loo.unpersist()
        n_solo, rec_solo, wall = solo[name]
        print(f"{name:14s} {n_solo:>10d} {rec_solo:>12.5f} "
              f"{n_loo:>10d} {rec_loo:>11.5f} {rec_all - rec_loo:>12.5f} {wall:>5.1f}s")


if __name__ == "__main__":
    main()
