"""Text normalization.

Same semantics as the reference's ``_normalize_string``
(/root/reference/src/feature_engineering.py:439-462): lowercase -> NFKD
decompose + strip combining marks -> strip punctuation -> collapse whitespace.

Two implementations:

* ``normalize_expr`` — pure native column expression (lower + regexp_replace +
  trim). No NFKD (Spark has no built-in Unicode decomposition), so accents are
  kept. Whole-stage-codegen'd, zero Python. Used wherever accent folding is
  not required and for DuckDB-oracle-comparable queries.
* ``normalize_nfkd`` — Arrow-batched pandas UDF adding NFKD accent folding via
  ``pd.Series.str.normalize`` (vectorized, no per-row Python loop). Used in
  the entity pipeline where "Schübert" must normalize to "schubert".
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_expr(col: Column | str) -> Column:
    """lower -> punctuation->space -> collapse whitespace -> trim (native)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    # Match the reference's r"[^\w\s]" -> " " (feature_engineering.py:452).
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


@F.pandas_udf(T.StringType())
def _nfkd_fold(s: pd.Series) -> pd.Series:
    # NFKD decompose then drop combining marks (accent folding). All ops are
    # vectorized pandas string methods over the Arrow batch.
    out = s.fillna("").str.normalize("NFKD")
    out = out.str.encode("ascii", errors="ignore").str.decode("ascii")
    return out.mask(s.isna())


def normalize_nfkd(col: Column | str) -> Column:
    """Full reference-parity normalize: NFKD fold + lower + strip punct."""
    c = F.col(col) if isinstance(col, str) else col
    return normalize_expr(_nfkd_fold(c))


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokens of an (already normalized) string; drops empties."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")
