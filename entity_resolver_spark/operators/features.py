"""Stage 3 — pairwise feature battery.

The reference computes per-pair features in 200-pair Python chunks with
per-pair vector fetches (/root/reference/src/classifying.py:1157-1234,
src/feature_engineering.py:1822-1924). Here the whole battery is ONE ``select``
over the pairs joined twice to the per-record attribute table — every feature
is either a native column expression or an Arrow-batched pandas UDF; there is
no per-row Python and no point lookups.

Feature set (analogue of the reference's enabled set, config.yml:276-290):
  name_jw            — Jaro-Winkler on name keys (X6/F4)
  name_lev_sim       — Levenshtein similarity on name keys (X6/F3, native)
  text_cosine        — cosine over hashed-TF vectors of the full normalized
                       text ("composite_cosine" X2; embeddings replaced by
                       hashed TF per north_rule)
  name_text_squared  — ((name_jw + text_cosine)/2)^2 ("person_title_squared"
                       X3's shape: average-then-square)
  year_match         — birth/death-year agreement (X4/F6)

The compute-once-per-distinct discipline the reference encodes (embed each
unique string once — src/embedding_and_indexing.py:835-912) is preserved:
hashed-TF vectors are computed per DISTINCT text_hash, then joined back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.functions.hashing import (
    hashed_tf_vectors,
    sparse_cosine_expr,
)
from entity_resolver_spark.functions.similarity import (
    jaro_winkler_pudf,
    levenshtein_sim_expr,
)
from entity_resolver_spark.functions.years import (
    year_conflict_expr,
    year_match_expr,
)

# Attributes each pair side needs. Keeping this projection narrow matters:
# the join fan-out is 2x pairs, so every extra column is paid twice.
_SIDE_COLS = ["conv_id", "name_key", "birth_year", "death_year", "text_hash"]


def text_vectors(records: DataFrame, cfg: EngineConfig) -> DataFrame:
    """(text_hash, vector) — hashed-TF per distinct normalized text."""
    distinct = records.select("text_hash", "tokens").dropDuplicates(["text_hash"])
    return hashed_tf_vectors(distinct, "text_hash", "tokens", cfg.tf_dim).select(
        F.col("text_hash"), F.col("vector")
    )


def pair_features(
    pairs: DataFrame,
    records: DataFrame,
    cfg: EngineConfig | None = None,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """pairs(left, right) -> per-pair feature columns.

    Plan shape: pairs ⋈ attrs(left) ⋈ attrs(right) ⋈ vec(left) ⋈ vec(right)
    -> one select. All joins are hash-equi-joins on record keys; Catalyst/AQE
    picks broadcast when the attribute side is small.
    """
    cfg = cfg or EngineConfig()
    attrs = records.select(*_SIDE_COLS)
    if vectors is None:
        vectors = text_vectors(records, cfg)

    l = attrs.select([F.col(c).alias(f"l_{c}") for c in _SIDE_COLS])
    r = attrs.select([F.col(c).alias(f"r_{c}") for c in _SIDE_COLS])
    vl = vectors.select(
        F.col("text_hash").alias("l_text_hash"), F.col("vector").alias("l_vec")
    )
    vr = vectors.select(
        F.col("text_hash").alias("r_text_hash"), F.col("vector").alias("r_vec")
    )

    df = (
        pairs.join(l, pairs["left"] == l["l_conv_id"])
        .join(r, pairs["right"] == r["r_conv_id"])
        .join(vl, "l_text_hash", "left")
        .join(vr, "r_text_hash", "left")
    )

    name_jw = jaro_winkler_pudf(F.col("l_name_key"), F.col("r_name_key"))
    name_lev = levenshtein_sim_expr(F.col("l_name_key"), F.col("r_name_key"))
    # Identical-hash short-circuit (the reference returns 1.0 on identical
    # hashes before touching vectors, src/feature_engineering.py:905-915) and
    # the reference's 0.5 missing-vector fallback (:930-948).
    text_cos = (
        F.when(F.col("l_text_hash") == F.col("r_text_hash"), F.lit(1.0))
        .otherwise(
            F.coalesce(
                sparse_cosine_expr(F.col("l_vec"), F.col("r_vec")), F.lit(0.5)
            )
        )
    )
    df = (
        df.withColumn("name_jw", name_jw)
        .withColumn("name_lev_sim", name_lev)
        .withColumn("text_cosine", text_cos)
    )
    # Low-similarity indicator (reference X7 person_low_cosine_indicator,
    # src/feature_engineering.py:951-1070, thresholds config.yml:303-309):
    # gives the linear scorer the curvature to reject same-name records whose
    # contexts clearly diverge — transitive closure punishes those hardest.
    df = df.withColumn(
        "text_low", (F.col("text_cosine") < F.lit(0.6)).cast("double")
    )
    df = df.withColumn(
        "name_text_squared",
        F.pow((F.col("name_jw") + F.col("text_cosine")) / 2.0, 2),
    ).withColumn(
        "year_match",
        year_match_expr(
            F.col("l_birth_year"),
            F.col("l_death_year"),
            F.col("r_birth_year"),
            F.col("r_death_year"),
            cfg.year_tolerance,
        ),
    ).withColumn(
        "year_conflict",
        year_conflict_expr(
            F.col("l_birth_year"),
            F.col("l_death_year"),
            F.col("r_birth_year"),
            F.col("r_death_year"),
            cfg.year_tolerance,
        ),
    )
    return df.select("left", "right", *cfg.feature_cols)
