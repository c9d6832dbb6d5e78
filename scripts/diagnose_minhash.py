"""Measure minhash_lsh_blocks variants at one corpus size: the shipped
string-shingle form vs a long-hash form that never materializes shingle
strings (token hashes -> xxhash64 over a sliced long array per window, then
n_hashes cheap long re-hashes). Prints wall + block rows for each.

Usage: SPARK_GRAFT_DIAG_ENTITIES=72000 SPARK_GRAFT_CPUS=16 \
       python scripts/diagnose_minhash.py
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


def shingle_hashes_expr(tokens, k):
    th = F.transform(tokens, lambda t: F.xxhash64(t))
    n = F.size(tokens)
    windows = F.transform(
        F.sequence(F.lit(0), n - k), lambda i: F.xxhash64(F.slice(th, i + 1, k))
    )
    return F.when(n >= k, windows).otherwise(F.array(F.xxhash64(th)))


def minhash_lsh_blocks_longs(records, cfg):
    from entity_resolver_spark.functions.hashing import lsh_band_keys

    with_sh = records.select(
        "conv_id",
        shingle_hashes_expr(F.col("tokens"), cfg.shingle_k).alias("_sh"),
        B._sorted_name_key().alias("skey"),
    )
    exploded = with_sh.select(
        "conv_id", F.explode("_sh").alias("_s"), "skey"
    )
    aggs = [
        F.min(F.xxhash64(F.col("_s"), F.lit(i))).alias(f"_h{i}")
        for i in range(cfg.minhash_hashes)
    ] + [F.first("skey").alias("skey")]
    sig = exploded.groupBy("conv_id").agg(*aggs)
    sig = sig.select(
        "conv_id",
        F.array(*[F.col(f"_h{i}") for i in range(cfg.minhash_hashes)]).alias("sig"),
        "skey",
    )
    keys = lsh_band_keys(F.col("sig"), cfg.minhash_hashes, cfg.minhash_bands)
    tagged = F.transform(keys, lambda k: F.concat(F.lit("m"), k))
    return sig.select("conv_id", F.explode(tagged).alias("block_key"), "skey")


def main() -> None:
    n_entities = int(os.environ.get("SPARK_GRAFT_DIAG_ENTITIES", "72000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("mh-diag", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).count()
    cfg = EngineConfig()
    data = datagen.generate(
        n_entities=n_entities, convs_per_entity=(2, 5), turns_per_conv=(3, 12)
    )
    transcripts = datagen.to_spark(spark, data["transcripts"]).repartition(cpus)
    labeled = spark.createDataFrame(data["labeled_pairs"])
    records = build_entity_records(transcripts).localCheckpoint()
    records.count()
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

    for name, fn in (
        ("string-shingles (shipped)", B.minhash_lsh_blocks),
        ("long-hash shingles", minhash_lsh_blocks_longs),
    ):
        for rep in range(2):
            t0 = time.monotonic()
            blocks = fn(records, cfg).localCheckpoint()
            n = blocks.count()
            wall = time.monotonic() - t0
            pairs = B.pairs_from_blocks(
                B.split_hot_blocks(blocks, cfg, materialized=True)
            )
            cov = truths.join(pairs, ["left", "right"], "left_semi").count()
            print(
                f"{name:28s} rep{rep} wall={wall:6.1f}s rows={n:>9d} "
                f"solo_recall={cov / n_truth:.5f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
