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
    — a shuffle on small keys, never a cross join.

    The hyperplanes live in a BROADCAST DataFrame (one row per table, an
    array<array<double>> of planes), not in plan literals: at dim 1536 the
    literal form is n_tables*n_bits*1536 ~ 100k constants, which bloats the
    plan/codegen far past Spark's limits. The broadcast join fans each vector
    out to n_tables rows; the bucket is a sign-bit string computed per row.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    spark = corpus.sparkSession
    planes_df = spark.createDataFrame(
        [(t, rng.normal(size=(n_bits, dim)).tolist()) for t in range(n_tables)],
        "tbl int, planes array<array<double>>",
    )

    def buckets(df: DataFrame, idname: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        bkt = F.array_join(
            F.transform(
                F.col("planes"),
                lambda p: F.when(_dot(v, p) >= 0, F.lit("1")).otherwise(F.lit("0")),
            ),
            "",
        )
        return df.crossJoin(F.broadcast(planes_df)).select(
            F.col(id_col).alias(idname), F.col("tbl"), bkt.alias("bkt")
        )

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
    cells.

    Centroids live in a BROADCAST DataFrame (not plan literals — at dim 1536
    the literal form is n_cells*1536 constants). Cell assignment fans each
    vector out to n_cells rows against the broadcast centroids and reduces
    with max(struct(sim, cell)) — lexicographic max reproduces the previous
    reverse-sorted (sim, cell) tie-break exactly. The corpus-side groupBy is
    the one-off index-build shuffle; queries stay broadcast-only.
    """
    seeds = [
        r[0]
        for r in corpus.select(vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(997)), F.col(id_col))
        .limit(n_cells)
        .collect()
    ]
    spark = corpus.sparkSession
    cents = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in s]) for i, s in enumerate(seeds)],
            "cell int, cent array<double>",
        )
    )

    def with_cellsim(df: DataFrame, vname: str) -> DataFrame:
        sim = cosine_expr(F.col(vname).cast("array<double>"), F.col("cent"))
        return df.crossJoin(cents).select(*df.columns, "cell", sim.alias("sim"))

    c = (
        with_cellsim(
            corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")),
            "c_vec",
        )
        .groupBy("vec_id")
        .agg(
            F.max(F.struct("sim", "cell"))["cell"].alias("cell"),
            F.first("c_vec").alias("c_vec"),
        )
    )
    q = (
        with_cellsim(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
            "q_vec",
        )
        .groupBy("query_id")
        .agg(
            F.slice(
                F.reverse(F.array_sort(F.collect_list(F.struct("sim", "cell")))),
                1,
                nprobe,
            ).alias("probes"),
            F.first("q_vec").alias("q_vec"),
        )
        .select(
            "query_id",
            "q_vec",
            F.explode(F.transform("probes", lambda s: s["cell"])).alias("cell"),
        )
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
