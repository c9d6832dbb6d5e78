"""Document deduplication operators for large-scale training-data pipelines.

The reference's preprocessing is itself a dedup engine (hash every field
value once, /root/reference/src/preprocessing.py:144-210); these operators
generalize that to document corpora at 100 TB scale:

* exact_dedup        — hash-groupBy on normalized text (the reference's
                       string_dict mechanism).
* minhash_dedup      — MinHash + banded LSH + bucket self-join, the standard
                       web-scale near-dup pipeline (shingle -> minhash ->
                       band -> bucket-join).
* simhash_pairs      — 64-bit SimHash + Hamming-distance candidate pairs via
                       band rotation.
* ngram_jaccard_pairs— exact n-gram Jaccard via explode + self-join +
                       intersection/union counting (no hashing, SQL-oracle
                       friendly; the verification step after LSH).
* embedding_near_dup — cosine near-dup over an embedding column: SRP-LSH
                       bucketed candidate generation (reuses lsh_topk's
                       machinery) + exact cosine verification >= threshold.

All are pure DataFrame plans; skew-prone self-joins go through the same
hot-block splitting as entity blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entity_resolver_spark.functions.hashing import (
    hamming64_expr,
    lsh_band_keys,
    minhash_signature,
    shingles_expr,
)
from entity_resolver_spark.functions.normalize import normalize_expr, tokens_expr


@F.pandas_udf(T.LongType())
def _simhash_pudf(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash per token array. Token hashes via blake2b (fixed-seed
    deterministic across worker processes — Python's builtin hash() is not)."""
    from hashlib import blake2b

    out = np.zeros(len(tokens), dtype=np.int64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            continue
        hs = np.frombuffer(
            b"".join(blake2b(t.encode(), digest_size=8).digest() for t in toks),
            dtype="<u8",
        ).astype(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int32
        ) * 2 - 1
        votes = bits.sum(axis=0)
        fp = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                fp |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(fp)
    return pd.Series(out)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per distinct normalized text. Returns
    (doc_id, canonical_id, n_dups) for every doc (canonical rows included)."""
    h = F.xxhash64(normalize_expr(F.col(text_col)))
    hashed = docs.select(F.col(id_col), h.alias("_h"))
    canon = hashed.groupBy("_h").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_dups")
    )
    return hashed.join(canon, "_h").select(id_col, "canonical_id", "n_dups")


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH: (left, right,
    est_jaccard) where est_jaccard is the signature-agreement estimate."""
    toks = docs.select(
        F.col(id_col).alias("id"), tokens_expr(normalize_expr(F.col(text_col))).alias("_t")
    )
    sh = toks.select("id", shingles_expr(F.col("_t"), shingle_k).alias("_sh"))
    sig = minhash_signature(sh, "id", "_sh", n_hashes).persist()
    keys = lsh_band_keys(F.col("sig"), n_hashes, bands)
    blocks = sig.select("id", F.explode(keys).alias("bk"))
    pairs = (
        blocks.alias("a")
        .join(blocks.alias("b"), "bk")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("left"), F.col("b.id").alias("right"))
        .dropDuplicates(["left", "right"])
    )
    l = sig.select(F.col("id").alias("left"), F.col("sig").alias("l_sig"))
    r = sig.select(F.col("id").alias("right"), F.col("sig").alias("r_sig"))
    est = F.aggregate(
        F.zip_with("l_sig", "r_sig", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(n_hashes)
    return (
        pairs.join(l, "left").join(r, "right")
        .select("left", "right", est.cast("double").alias("est_jaccard"))
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: docs whose 64-bit SimHashes are within
    ``max_hamming`` bits. Uses the classic band trick: split the fingerprint
    into ``n_bands`` 16-bit bands; any pair within Hamming distance
    ``n_bands - 1`` agrees exactly on >=1 band, so a per-band equi-join finds
    all candidates without an O(n^2) scan. SimHash itself is computed in a
    vectorized pandas UDF (64 per-bit native aggregates make a pathological
    expression tree)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        tokens_expr(normalize_expr(F.col(text_col))).alias("_t"),
    )
    fp = toks.select("id", _simhash_pudf("_t").alias("fp")).persist()
    bands = None
    for b in range(n_bands):
        part = fp.select(
            "id", "fp",
            F.concat_ws(
                ":", F.lit(str(b)),
                F.shiftright("fp", b * (64 // n_bands))
                .bitwiseAND(F.lit((1 << (64 // n_bands)) - 1))
                .cast("string"),
            ).alias("bk"),
        )
        bands = part if bands is None else bands.unionByName(part)
    pairs = (
        bands.alias("a")
        .join(bands.select("bk", F.col("id").alias("rid"), F.col("fp").alias("rfp")).alias("b"), "bk")
        .where(F.col("id") < F.col("rid"))
        .select(
            F.col("id").alias("left"),
            F.col("rid").alias("right"),
            hamming64_expr(F.col("fp"), F.col("rfp")).alias("hamming"),
        )
        .dropDuplicates(["left", "right"])
    )
    return pairs.where(F.col("hamming") <= max_hamming)


def embedding_near_dup(
    docs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (left, right, cos_sim >= threshold).

    Scale path (default): signed-random-projection buckets (broadcast
    hyperplane tables, same construction as similarity_search.lsh_topk) —
    near-identical vectors agree on every sign bit w.h.p., so candidates come
    from an equi-join on (table, bucket), never an all-pairs product; exact
    cosine then verifies. ``exact=True`` switches candidate generation to the
    full self-join — the small-corpus/oracle baseline.
    """
    from entity_resolver_spark.functions.similarity import cosine_expr

    c = docs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if exact:
        cand = (
            c.select(F.col("_id").alias("left"))
            .crossJoin(c.select(F.col("_id").alias("right")))
            .where(F.col("left") < F.col("right"))
        )
    else:
        dim = len(docs.select(vec_col).first()[0])
        rng = np.random.RandomState(seed)
        planes_df = docs.sparkSession.createDataFrame(
            [(t, rng.normal(size=(n_bits, dim)).tolist()) for t in range(n_tables)],
            "tbl int, planes array<array<double>>",
        )
        v = F.col("_v").cast("array<double>")
        dot = lambda a, b: F.aggregate(  # noqa: E731
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        bkt = F.array_join(
            F.transform(
                F.col("planes"),
                lambda p: F.when(dot(v, p) >= 0, F.lit("1")).otherwise(F.lit("0")),
            ),
            "",
        )
        b = c.crossJoin(F.broadcast(planes_df)).select(
            "_id", F.col("tbl"), bkt.alias("bkt")
        )
        cand = (
            b.alias("a")
            .join(b.select(F.col("_id").alias("_rid"), "tbl", "bkt").alias("r"), ["tbl", "bkt"])
            .where(F.col("_id") < F.col("_rid"))
            .select(F.col("_id").alias("left"), F.col("_rid").alias("right"))
            .dropDuplicates(["left", "right"])
        )
    l = c.select(F.col("_id").alias("left"), F.col("_v").alias("_lv"))
    r = c.select(F.col("_id").alias("right"), F.col("_v").alias("_rv"))
    sim = cosine_expr(
        F.col("_lv").cast("array<double>"), F.col("_rv").cast("array<double>")
    )
    return (
        cand.join(l, "left")
        .join(r, "right")
        .select("left", "right", sim.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact word-k-gram Jaccard for given candidate pairs (left, right):
    explode distinct shingles per side, count intersection via join, compute
    |A∩B| / (|A| + |B| - |A∩B|). This is the LSH verification step — exact,
    set-based, SQL-expressible (DuckDB oracle runs the same logic)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                shingles_expr(tokens_expr(normalize_expr(F.col(text_col))), shingle_k)
            )
        ).alias("g"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("left"), "g")
    b = sh.select(F.col("id").alias("right"), "g")
    inter = (
        candidates.join(a, "left").join(b, ["right", "g"])
        .groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("left"), F.col("n").alias("n_left"))
    sb = sizes.select(F.col("id").alias("right"), F.col("n").alias("n_right"))
    return (
        candidates.join(inter, ["left", "right"], "left")
        .join(sa, "left")
        .join(sb, "right")
        .select(
            "left",
            "right",
            (
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (F.col("n_left") + F.col("n_right") - F.coalesce(F.col("n_inter"), F.lit(0)))
            ).alias("jaccard"),
        )
    )
