"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolver_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog near the river bank"),  # near dup of 0
    (3, "completely different content about spark query engines and shuffles"),
    (4, "THE QUICK BROWN FOX  jumps over the lazy dog near the river bank!"),  # normalized dup of 0
    (5, "spark query engines shuffle data between executors for joins"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_exact_dedup(docs):
    out = {r["doc_id"]: r["canonical_id"] for r in exact_dedup(docs).collect()}
    assert out[0] == 0 and out[1] == 0 and out[4] == 0
    assert out[2] == 2 and out[3] == 3 and out[5] == 5


def test_minhash_near_dup(docs):
    pairs = {
        (r["left"], r["right"]): r["est_jaccard"]
        for r in minhash_dedup_pairs(docs).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.4
    assert (0, 4) in pairs
    # clearly-unrelated docs must not pair
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_ngram_jaccard_verification(spark, docs):
    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], ["left", "right"]
    )
    out = {
        (r["left"], r["right"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, cand).collect()
    }
    assert out[(0, 1)] == pytest.approx(1.0)
    assert 0.5 < out[(0, 2)] < 1.0
    assert out[(0, 3)] == pytest.approx(0.0)


def test_ngram_jaccard_matches_python_oracle(spark, docs):
    import re

    def shingles(text, k=3):
        toks = re.sub(r"[^\w\s]", " ", text.lower()).split()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    cand = spark.createDataFrame([(0, 2), (2, 3), (3, 5)], ["left", "right"])
    out = {
        (r["left"], r["right"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, cand).collect()
    }
    texts = dict(DOCS)
    for (l, r), got in out.items():
        a, b = shingles(texts[l]), shingles(texts[r])
        expect = len(a & b) / len(a | b)
        assert got == pytest.approx(expect, abs=1e-12), (l, r)


def test_simhash_pairs(docs):
    out = {(r["left"], r["right"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=8).collect()}
    assert (0, 1) in out and out[(0, 1)] == 0  # identical text -> identical fp
    assert (0, 4) in out and out[(0, 4)] == 0  # normalization-equal
    assert (0, 3) not in out


def test_embedding_near_dup_lsh_matches_exact(spark):
    """On clustered vectors (intra-cluster cosine ~0.99, cross <0.6) the
    SRP-LSH candidate path must find exactly the pairs the exact cross-join
    finds — near-identical vectors agree on every sign bit w.h.p., and the
    fixed seed makes the outcome deterministic."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for c in range(10):
        base = rng.normal(size=32)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + rng.normal(scale=0.02, size=32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    from entity_resolver_spark.operators.dedup import embedding_near_dup

    exact = {
        (r["left"], r["right"]): r["cos_sim"]
        for r in embedding_near_dup(emb, threshold=0.9, exact=True).collect()
    }
    lsh = {
        (r["left"], r["right"]): r["cos_sim"]
        for r in embedding_near_dup(emb, threshold=0.9, exact=False).collect()
    }
    # 10 clusters x 3 members -> 30 intra-cluster pairs
    assert len(exact) == 30
    assert set(lsh) == set(exact)
    for k, v in lsh.items():
        assert v == pytest.approx(exact[k], abs=1e-12)


def test_simhash_band_recall_contract(spark):
    """simhash_pairs must return EXACTLY the pairs within max_hamming bits —
    cross-checked against a brute-force Hamming computation over the same
    fingerprints. Near-dup families give nonzero distances whose differing
    bits spread across bands (the r2 bug class: a pair with bits differing
    in every band was silently dropped when n_bands <= max_hamming)."""
    import itertools

    from entity_resolver_spark.operators.dedup import simhash_fingerprints

    rng = __import__("random").Random(7)
    vocab = [f"tok{i}" for i in range(120)]
    rows = []
    did = 0
    for fam in range(8):
        base = rng.sample(vocab, 30)
        for v in range(5):
            toks = [t for t in base if rng.random() > 0.1 * v]
            rows.append((did, " ".join(toks) if toks else "empty"))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for max_h in (3, 6, 10):
        got = {
            (r["left"], r["right"]): r["hamming"]
            for r in simhash_pairs(docs, max_hamming=max_h).collect()
        }
        fps = dict(
            (r["id"], r["fp"]) for r in simhash_fingerprints(docs).collect()
        )
        want = {}
        for a, b in itertools.combinations(sorted(fps), 2):
            d = bin(fps[a] ^ fps[b]).count("1")
            if d <= max_h:
                want[(a, b)] = d
        assert got == want, f"max_hamming={max_h}"
    # sanity: some nonzero-distance pair exists so the contract is exercised
    got6 = simhash_pairs(docs, max_hamming=10).where("hamming > 0").count()
    assert got6 > 0
