"""Feature scaling: percentile-clipped min-max (the reference's scalers).

Reference parity:
* ``RobustMinMaxScaler`` — clip each feature at the p-th percentile, then
  min-max to [0,1] (/root/reference/src/robust_scaler.py:18-222).
* ``LibraryCatalogScaler`` — per-feature-group percentiles: person@98th,
  title@95th, context@90th, binary features preserved
  (/root/reference/src/robust_scaler.py:225-605). NOTE: the reference ships
  with enhanced scaling DISABLED (config.yml:29, raw-feature early-return at
  src/feature_engineering.py:1949-1953) — so the engine's default path is raw
  features too; this operator exists for parity and experimentation.

Fit = one aggregate row of exact percentiles (``F.percentile``; exact, so a
DuckDB ``quantile_cont`` oracle reproduces it bit-for-bit). Transform = pure
column expressions with the fitted bounds baked in as literals — like the
scorer, the fitted scaler ships inside the plan. Fitted params serialize to
JSON (reference persists scaler state the same way,
src/robust_scaler.py:607-712).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class FittedScaler:
    # col -> (lo, hi) clip+scale bounds
    bounds: dict[str, tuple[float, float]]

    def to_json(self) -> str:
        return json.dumps({k: list(v) for k, v in self.bounds.items()})

    @classmethod
    def from_json(cls, s: str) -> "FittedScaler":
        return cls({k: (v[0], v[1]) for k, v in json.loads(s).items()})

    def transform_expr(self, col: str) -> Column:
        lo, hi = self.bounds[col]
        if hi <= lo:
            return F.lit(0.0)
        clipped = F.least(F.greatest(F.col(col), F.lit(lo)), F.lit(hi))
        return (clipped - F.lit(lo)) / F.lit(hi - lo)

    def transform(self, df: DataFrame, cols: list[str] | None = None) -> DataFrame:
        cols = cols or list(self.bounds)
        out = df
        for c in cols:
            out = out.withColumn(c, self.transform_expr(c))
        return out


def fit_robust_scaler(
    df: DataFrame,
    cols: list[str],
    upper_percentile: float = 0.95,
    lower_percentile: float = 0.0,
    binary_cols: set[str] | None = None,
) -> FittedScaler:
    """One pass: exact percentiles per column. Binary columns (the reference
    preserves indicator features unscaled, src/robust_scaler.py:260-306) get
    identity bounds."""
    binary_cols = binary_cols or set()
    fit_cols = [c for c in cols if c not in binary_cols]
    if fit_cols:
        aggs = []
        for c in fit_cols:
            aggs.append(F.percentile(F.col(c), F.lit(lower_percentile)).alias(f"lo_{c}"))
            aggs.append(F.percentile(F.col(c), F.lit(upper_percentile)).alias(f"hi_{c}"))
        row = df.agg(*aggs).collect()[0]
        bounds = {c: (float(row[f"lo_{c}"]), float(row[f"hi_{c}"])) for c in fit_cols}
    else:
        bounds = {}
    for c in cols:
        if c in binary_cols:
            bounds[c] = (0.0, 1.0)
    return FittedScaler(bounds)


# Per-group percentile policy mirroring LibraryCatalogScaler
# (src/robust_scaler.py:260-306): name-similarity features clip high (98th),
# text features at 95th, contextual at 90th, indicators untouched.
FEATURE_GROUPS: dict[str, float] = {
    "name_jw": 0.98,
    "name_lev_sim": 0.98,
    "text_cosine": 0.95,
    "name_text_squared": 0.95,
    "year_match": 0.90,
}
BINARY_FEATURES = {"year_conflict", "text_low"}


def fit_grouped_scaler(df: DataFrame, cols: list[str]) -> FittedScaler:
    """LibraryCatalogScaler analogue: per-column percentile from its group."""
    bounds: dict[str, tuple[float, float]] = {}
    aggs = []
    fit_cols = [c for c in cols if c not in BINARY_FEATURES]
    for c in fit_cols:
        p = FEATURE_GROUPS.get(c, 0.95)
        aggs.append(F.min(c).alias(f"lo_{c}"))
        aggs.append(F.percentile(F.col(c), F.lit(p)).alias(f"hi_{c}"))
    if fit_cols:
        row = df.agg(*aggs).collect()[0]
        for c in fit_cols:
            bounds[c] = (float(row[f"lo_{c}"]), float(row[f"hi_{c}"]))
    for c in cols:
        if c in BINARY_FEATURES:
            bounds[c] = (0.0, 1.0)
    return FittedScaler(bounds)
