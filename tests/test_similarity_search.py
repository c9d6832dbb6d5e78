"""ANN operators: brute-force oracle vs LSH / IVF recall."""

from __future__ import annotations

import numpy as np
import pytest

from entity_resolver_spark.operators.similarity_search import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    from pyspark.sql import functions as F

    return emb.where(F.col("vec_id") < 5).cache()


@pytest.fixture(scope="module")
def exact(emb, queries):
    rows = brute_force_topk(emb, queries, k=10).collect()
    out: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append(r["vec_id"])
    return out


def test_brute_force_matches_numpy(emb, queries, exact):
    corpus = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    for qid, got in exact.items():
        q = corpus[qid]
        sims = {
            vid: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            for vid, v in corpus.items()
            if vid != qid
        }
        expect = [v for v, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))][:10]
        assert got == expect, qid


def test_lsh_recall(emb, queries, exact):
    # this corpus has weak neighbor structure (top-10 cosine ~0.3), so the
    # test uses short 4-bit sign patterns; real embedding spaces with tight
    # neighbors use longer patterns (collision p grows with similarity)
    rows = lsh_topk(emb, queries, k=10, n_tables=12, n_bits=4).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(got.get(q, set()) & set(exp)) / len(exp) for q, exp in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivf_recall(emb, queries, exact):
    rows = ivf_topk(emb, queries, k=10, n_cells=8, nprobe=4).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(got.get(q, set()) & set(exp)) / len(exp) for q, exp in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
