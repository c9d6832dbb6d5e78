"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k: query set x corpus join, native
  dot-product expression, per-query Window top-k. The correctness baseline.
* lsh_topk         — random-hyperplane (SRP) LSH bucketed variant: corpus and
  queries hashed into sign-pattern buckets (with multi-probe via several
  independent tables); candidates = bucket collisions only, then exact cosine
  re-rank. The 100 TB scale path: candidate generation is an equi-join on
  bucket keys instead of a full cross join.
* ivf_topk         — IVF-style: k seed centroids (deterministic sample),
  corpus assigned to nearest centroid once; queries probe the ``nprobe``
  nearest centroid cells only.

All math is native (zip_with + aggregate over array columns) — no Python in
the scoring loop. Hyperplanes/centroids are tiny broadcast tables.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_resolver_spark.functions.similarity import cosine_expr


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank<=k) — exact. The cross join is
    intentional (baseline); use lsh_topk/ivf_topk at scale."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_expr(
                F.col("q_vec").cast("array<double>"),
                F.col("c_vec").cast("array<double>"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _srp_bucket_expr(vec, planes: list[list[float]]):
    """Sign-pattern bucket id for one hyperplane table (native expression)."""
    bits = []
    for j, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec, arr) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via signed-random-projection LSH.

    Each of ``n_tables`` independent tables hashes a vector to an
    ``n_bits``-bit sign pattern; candidates are ids colliding with the query
    in >=1 table. Collisions are found with one equi-join on (table, bucket)
    after a posexplode — a shuffle on small keys, never a cross join.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    tables = [rng.normal(size=(n_bits, dim)).tolist() for _ in range(n_tables)]

    def buckets(df: DataFrame, idname: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        cols = [
            F.struct(F.lit(t).alias("tbl"), _srp_bucket_expr(v, planes).alias("bkt"))
            for t, planes in enumerate(tables)
        ]
        return df.select(
            F.col(id_col).alias(idname), F.explode(F.array(*cols)).alias("tb")
        ).select(idname, "tb.tbl", "tb.bkt")

    qb = buckets(queries, "query_id")
    cb = buckets(corpus, "vec_id")
    cand = (
        qb.join(cb, ["tbl", "bkt"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .dropDuplicates()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand.join(q, "query_id")
        .join(c, "vec_id")
        .select(
            "query_id",
            "vec_id",
            cosine_expr(
                F.col("q_vec").cast("array<double>"),
                F.col("c_vec").cast("array<double>"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-flat: corpus partitioned into ``n_cells`` Voronoi cells around
    deterministic sampled seeds; queries scan only their ``nprobe`` nearest
    cells. Centroids are a broadcast list of literals."""
    seeds = [
        r[0]
        for r in corpus.select(vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(997)), F.col(id_col))
        .limit(n_cells)
        .collect()
    ]

    def cell_ranks(vec, take: int):
        sims = [
            F.struct(
                cosine_expr(vec, F.array(*[F.lit(float(x)) for x in s])).alias("sim"),
                F.lit(i).alias("cell"),
            )
            for i, s in enumerate(seeds)
        ]
        return F.slice(F.reverse(F.array_sort(F.array(*sims))), 1, take)

    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")
    ).withColumn(
        "cell", cell_ranks(F.col("c_vec").cast("array<double>"), 1)[0]["cell"]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).select(
        "query_id",
        "q_vec",
        F.explode(
            F.transform(
                cell_ranks(F.col("q_vec").cast("array<double>"), nprobe),
                lambda s: s["cell"],
            )
        ).alias("cell"),
    )
    scored = (
        q.join(c, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_expr(
                F.col("q_vec").cast("array<double>"),
                F.col("c_vec").cast("array<double>"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
