"""Spark-side scoring-segment A/B over the staged 144k inputs parquet.

Times (median of 3 steady-state noop writes, after 1 warm pass) selected
sub-plans of the er_score segment at SPARK_GRAFT_CPUS parallelism:
  scan     — checkpointed inputs scan only
  jw       — scan + jaro_winkler_pudf
  lev      — scan + native levenshtein expression
  full     — features_from_inputs + score_pairs (the bench segment)

Usage: SPARK_GRAFT_CPUS=16 python scripts/segment_ab.py [sub ...]
Optional env SPARK_GRAFT_SORT_INPUTS=1 applies sortWithinPartitions
(l_name_key, r_name_key) before the checkpoint — the candidate stage-layout
change (pair_inputs would pay it once per corpus).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from entity_resolver_spark.functions.similarity import (
    jaro_winkler_pudf,
    levenshtein_sim_expr,
)
from entity_resolver_spark.operators.features import features_from_inputs
from entity_resolver_spark.operators.scoring import Model, score_pairs
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
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    subs = sys.argv[1:] or ["scan", "jw", "lev", "full"]
    arrow_batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH")
    extra = (
        {"spark.sql.execution.arrow.maxRecordsPerBatch": arrow_batch}
        if arrow_batch
        else None
    )
    spark = get_spark(
        "seg-ab", master=f"local[{cpus}]", shuffle_partitions=cpus, extra_conf=extra
    )
    spark.range(1000).count()
    inputs = spark.read.parquet(os.path.join(REPO, ".benchtmp", "inputs144k"))
    if os.environ.get("SPARK_GRAFT_SORT_INPUTS"):
        inputs = inputs.sortWithinPartitions("l_name_key", "r_name_key")
    inputs = inputs.localCheckpoint()
    n = inputs.count()

    plans = {
        "scan": lambda: inputs,
        "jw": lambda: inputs.select(
            jaro_winkler_pudf(
                F.col("l_name_key"), F.col("r_name_key")
            ).alias("jw")
        ),
        "lev": lambda: inputs.select(
            levenshtein_sim_expr(
                F.col("l_name_key"), F.col("r_name_key")
            ).alias("lv")
        ),
        "full": lambda: score_pairs(features_from_inputs(inputs), Model.default()),
    }
    out = {"cpus": cpus, "rows": n,
           "sorted": bool(os.environ.get("SPARK_GRAFT_SORT_INPUTS"))}
    for s in subs:
        out[s] = round(steady(plans[s]()), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
