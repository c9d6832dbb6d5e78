"""Pairwise string / vector similarity primitives.

Reference parity:
* Levenshtein similarity — /root/reference/src/feature_engineering.py:659-726
  (1 - dist / max_len). Spark has a built-in ``levenshtein`` so this is a pure
  column expression.
* Jaro-Winkler — /root/reference/src/feature_engineering.py:728-797 (classic
  JW, prefix scale 0.1, prefix length <= 4). No Spark built-in -> Arrow-batched
  pandas UDF. The inner loop is per-pair Python but batched through Arrow
  (the reference computes it per-pair in pure Python too; at scale swap in a
  compiled library via the same UDF seam).
* Cosine — /root/reference/src/feature_engineering.py:581-657 (dot/(|a||b|),
  clamped to [0,1], 1.0 when both effectively zero). Two implementations:
  a native expression over array<double> (zip_with + aggregate, codegen'd)
  and a numpy pandas UDF (fast path for wide vectors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def levenshtein_sim_expr(a: Column, b: Column) -> Column:
    """1 - levenshtein(a,b)/max(len) with both-empty -> 1.0."""
    max_len = F.greatest(F.length(a), F.length(b))
    return F.when(max_len == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / max_len
    )


def _jaro(s1: str, s2: str) -> float:
    """Classic Jaro similarity (same algorithm family as the reference's
    hand-written implementation at src/feature_engineering.py:728-771)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == ch:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    return (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """JW = jaro + prefix_len(<=4) * p * (1 - jaro)."""
    j = _jaro(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 == c2:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1.0 - j)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_pudf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.fillna("").to_numpy()
    bv = b.fillna("").to_numpy()
    out = np.empty(len(av), dtype=np.float64)
    for i in range(len(av)):
        out[i] = jaro_winkler(av[i], bv[i])
    return pd.Series(out)


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine over two array<double> columns, native (zip_with + aggregate).

    Semantics follow the reference (src/feature_engineering.py:581-657):
    result clamped to [0,1]; if both norms ~0 -> 1.0 (identical emptiness);
    one zero side -> 0.0.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    eps = 1e-10
    raw = dot / (na * nb)
    return (
        F.when((na < eps) & (nb < eps), F.lit(1.0))
        .when((na < eps) | (nb < eps), F.lit(0.0))
        .otherwise(F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0)))
    )


@F.pandas_udf(T.DoubleType())
def sparse_cosine_pudf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Dot product of two L2-normalized sparse map<int,double> vectors
    (Arrow map columns arrive as per-row dicts). Semantically identical to
    ``hashing.sparse_cosine_expr`` but evaluated in the Python stage:
    Catalyst re-inlines interpreted higher-order functions per consumer
    (measured: 3 evaluations/row, map allocations GC-bound the executors),
    while a Python UDF is computed once and its result reused as a column."""
    out = np.empty(len(a), dtype=np.float64)
    av = a.to_numpy()
    bv = b.to_numpy()
    for i in range(len(av)):
        x, y = av[i], bv[i]
        if x is None or y is None:
            out[i] = np.nan
            continue
        if len(y) < len(x):
            x, y = y, x
        dot = 0.0
        for k, v in x.items():
            w = y.get(k)
            if w is not None:
                dot += v * w
        out[i] = min(max(dot, 0.0), 1.0)
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def cosine_pudf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Numpy-vectorized cosine over array columns (Arrow batch in, one
    matmul-free fused pass; fast path for wide dense vectors)."""
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        va, vb = a.iloc[i], b.iloc[i]
        if va is None or vb is None:
            out[i] = np.nan
            continue
        va = np.asarray(va, dtype=np.float64)
        vb = np.asarray(vb, dtype=np.float64)
        na = np.linalg.norm(va)
        nb = np.linalg.norm(vb)
        if na < 1e-10 and nb < 1e-10:
            out[i] = 1.0
        elif na < 1e-10 or nb < 1e-10:
            out[i] = 0.0
        else:
            out[i] = min(max(float(va @ vb) / (na * nb), 0.0), 1.0)
    return pd.Series(out)
