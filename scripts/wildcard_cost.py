"""Measure the cost/benefit of the two candidate fixes for the 144k
blocking-recall residual (diagnose_f1 at 144k: 1615 missed true pairs,
1007 with no shared rare shingle — dominated by pure-initial name forms
forgone by the hot-block split).

Lever A — wildcard routing: members of a HOT block whose name contains a
single-letter token (initial forms, e.g. "b laplace") are the ambiguous
ones a rank-ordered split cannot place; routing them to EVERY sub-block
guarantees their recall at a cost of ~w*(n-w) extra pairs per hot block.
This script computes that exact gross volume and how many of the actual
misses it would recover (both overall and restricted to anchor-pass
blocks i:/p:/a:).

Lever B — rare-shingle df cap x2: blocks from shingles with df in
(cap, 2*cap] — gross extra pairs = sum C(df,2) over those shingles; the
recoverable-miss count for this lever comes from diagnose_f1's
"df_cap_2x_would_catch" bucket.

Usage: SPARK_GRAFT_DIAG_ENTITIES=144000 SPARK_GRAFT_CPUS=16 \
       python scripts/wildcard_cost.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from entity_resolver_spark import datagen
from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.operators.blocking import (
    _shingle_hash_rows,
    all_blocks,
    pairs_from_blocks,
    split_hot_blocks,
)
from entity_resolver_spark.operators.transcripts import build_entity_records
from entity_resolver_spark.session import get_spark


def main() -> None:
    n_entities = int(os.environ.get("SPARK_GRAFT_DIAG_ENTITIES", "144000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("wildcard-cost", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()

    cfg = EngineConfig()
    cap = cfg.max_block_size
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
    records = build_entity_records(transcripts).localCheckpoint()
    labeled = spark.createDataFrame(data["labeled_pairs"])

    blocks = all_blocks(records, cfg).localCheckpoint()
    pairs = pairs_from_blocks(
        split_hot_blocks(blocks, cfg, materialized=True)
    ).localCheckpoint()
    n_pairs = pairs.count()

    truths = labeled.where("match").select(
        F.least("left", "right").alias("left"),
        F.greatest("left", "right").alias("right"),
    ).dropDuplicates(["left", "right"])
    misses = truths.join(pairs, ["left", "right"], "left_anti").localCheckpoint()
    n_miss = misses.count()

    # initial-form flag: any single-letter name token
    wc = records.select(
        "conv_id",
        F.exists(
            F.filter(F.split(F.col("name_key"), r"\s+"), lambda t: t != ""),
            lambda t: F.length(t) == 1,
        ).alias("_wild"),
    )
    n_wild = wc.where("_wild").count()

    hot = (
        blocks.groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > cap)
        .localCheckpoint()
    )
    hb = blocks.join(F.broadcast(hot), "block_key").join(wc, "conv_id")
    per_block = hb.groupBy("block_key").agg(
        F.first("_n").alias("n"),
        F.sum(F.col("_wild").cast("long")).alias("w"),
    )
    anchor = F.col("block_key").rlike("^(i:|p:|a:)")
    vol = per_block.select(
        (F.col("w") * (F.col("n") - F.col("w"))
         + (F.col("w") * (F.col("w") - 1)) / 2).alias("gross"),
        anchor.alias("is_anchor"),
    ).groupBy("is_anchor").agg(F.sum("gross").alias("gross_pairs")).collect()
    gross = {("anchor" if r["is_anchor"] else "other"): int(r["gross_pairs"]) for r in vol}

    # which misses would wildcard routing recover?
    side = hb.select("conv_id", "block_key", "_wild")
    m = (
        misses.join(side.selectExpr("conv_id as left", "block_key",
                                    "_wild as _lw"), "left")
        .join(side.selectExpr("conv_id as right", "block_key", "_wild as _rw"),
              ["right", "block_key"])
        .where(F.col("_lw") | F.col("_rw"))
        .select("left", "right", anchor.alias("is_anchor"))
    )
    rec_any = m.select("left", "right").distinct().count()
    rec_anchor = m.where("is_anchor").select("left", "right").distinct().count()

    # Lever B: rare-shingle df-cap x2 gross volume
    sh = _shingle_hash_rows(records, cfg)
    dfc = sh.groupBy("_gh").agg(F.count(F.lit(1)).alias("_df"))
    lever_b = dfc.where(
        (F.col("_df") > cfg.rare_shingle_max_df)
        & (F.col("_df") <= 2 * cfg.rare_shingle_max_df)
    ).agg(
        F.sum((F.col("_df") * (F.col("_df") - 1)) / 2).alias("gross")
    ).collect()[0]["gross"]

    print(json.dumps({
        "n_entities": n_entities,
        "n_records": records.count(),
        "n_pairs": n_pairs,
        "n_missed_true_pairs": n_miss,
        "n_wildcard_records": n_wild,
        "wildcard_gross_extra_pairs": gross,
        "misses_recovered_by_wildcard_any_hot_block": rec_any,
        "misses_recovered_by_wildcard_anchor_blocks_only": rec_anchor,
        "dfcap2x_gross_extra_pairs": int(lever_b or 0),
    }))


if __name__ == "__main__":
    main()
