"""Stage the 144k-entity scoring-segment inputs to parquet once, so kernel
profiling / A-B experiments re-read them instead of re-running datagen +
blocking + the pair join (~10 min) per experiment.

Writes:
  .benchtmp/inputs144k/        — full pair_inputs output (compact rows)
  .benchtmp/namepairs144k/     — (l_name_key, r_name_key) only, same order
  .benchtmp/stage_meta.json    — row count, timings

Usage: python scripts/stage_inputs_144k.py  (quiet box, ~10 min at local[16])
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
from entity_resolver_spark.operators.features import pair_inputs, text_vectors
from entity_resolver_spark.operators.transcripts import build_entity_records
from entity_resolver_spark.session import get_spark


def main() -> None:
    n_entities = int(os.environ.get("SPARK_GRAFT_STAGE_ENTITIES", "144000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    out_dir = os.path.join(REPO, ".benchtmp")
    spark = get_spark("er-stage", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()

    meta: dict = {"n_entities": n_entities, "cpus": cpus}
    t0 = time.monotonic()
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
    meta["datagen_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    records = build_entity_records(transcripts).localCheckpoint()
    meta["n_records"] = records.count()
    meta["normalize_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    pairs = candidate_pairs(records).localCheckpoint()
    meta["n_pairs"] = pairs.count()
    meta["blocking_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    vectors = text_vectors(records, EngineConfig()).localCheckpoint()
    vectors.count()
    meta["vectors_s"] = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    inputs = pair_inputs(pairs, records, vectors=vectors)
    inputs.write.mode("overwrite").parquet(os.path.join(out_dir, "inputs144k"))
    meta["pair_inputs_write_s"] = round(time.monotonic() - t0, 1)

    # name pairs alone, preserving the on-disk order scoring batches see
    spark.read.parquet(os.path.join(out_dir, "inputs144k")).select(
        "l_name_key", "r_name_key"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "namepairs144k"))

    with open(os.path.join(out_dir, "stage_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
