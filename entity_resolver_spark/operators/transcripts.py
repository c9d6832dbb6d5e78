"""Stage 1 — transcripts -> entity_records (the reference's preprocessing).

The reference's "entity record" is a CSV row per person occurrence with a
``composite`` text and a ``person`` name key (/root/reference/
src/preprocessing.py:76-142). For transcript input the analogue is one record
per conversation: full_text = per-conversation concatenation of turn texts
under stable (conv_id, turn_idx) ordering (the per-turn text-equality
invariant), and name_key = normalized leading name mention of the first turn.

Ordering is enforced with ``array_sort(collect_list(struct(turn_idx, text)))``
— deterministic regardless of input row order or shuffle nondeterminism, with
no Window shuffle-order hazard. One shuffle total (the groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolver_spark.functions.hashing import content_hash
from entity_resolver_spark.functions.normalize import normalize_nfkd, tokens_expr
from entity_resolver_spark.functions.years import birth_year_expr, death_year_expr

# The name mention is the leading run of name-like tokens of the first turn:
# capitalized words (any script, incl. decomposed diacritics), initials
# ("J."), life-date decorations ("1797-1828", "b. 1797", "ca. 1750"), and
# name punctuation — stopping at the first lowercase body word. This is the
# transcript analogue of the reference's authority-formatted ``person``
# column (src/preprocessing.py:91), which arrives pre-extracted in CSV.
_NAME_RE = (
    r"^((?:\p{Lu}[\p{L}\p{M}']*\.?"  # Capitalized word or initial
    r"|\d{3,4}"                       # year
    r"|b\.|d\.|ca\.|fl\.|born|died|circa|approximately"
    r"|[,()\-–—]|\s)+)"
)


def build_entity_records(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> entity_records.

    Output columns:
      conv_id, full_text (ordered concat), first_turn, name_raw, name_key
      (NFKD-normalized, date-decorations stripped), norm_text, name_hash,
      text_hash, birth_year, death_year, n_turns, tokens (of norm_text).
    """
    ordered = (
        transcripts.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "text"))
            ).alias("_turns"),
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("started_at"),
            # Distinct tools used, sorted for determinism — the taxonomy
            # feature's category set (reference derives categories from
            # subject classification, src/taxonomy_feature.py:267-313; tools
            # are the signal transcripts carry). Same groupBy, zero extra
            # shuffle.
            F.array_sort(
                F.array_distinct(F.collect_list("tool"))
            ).alias("categories"),
        )
        .select(
            "conv_id",
            "n_turns",
            "started_at",
            "categories",
            F.array_join(
                F.transform(F.col("_turns"), lambda t: t["text"]), "\n"
            ).alias("full_text"),
            F.element_at(F.col("_turns"), 1)["text"].alias("first_turn"),
        )
    )
    name_raw = F.regexp_extract(F.col("first_turn"), _NAME_RE, 1)
    records = ordered.withColumn("name_raw", name_raw)
    # Strip the year decorations from the *name key* so "Schubert, Franz" and
    # "Schubert, Franz, 1797-1828" share a key after normalization; years are
    # kept as separate typed columns.
    name_no_years = F.regexp_replace(
        F.col("name_raw"),
        r"[,(]?\s*(?:b\.?|d\.?|born|died|ca\.?|circa|approximately|fl\.?)?"
        r"\s*\d{3,4}\??\s*[-–—]?\s*\d{0,4}\??\s*[)]?",
        " ",
    )
    records = (
        records.withColumn("name_key", normalize_nfkd(name_no_years))
        .withColumn("norm_text", normalize_nfkd(F.col("full_text")))
        .withColumn("birth_year", birth_year_expr(F.col("name_raw")))
        .withColumn("death_year", death_year_expr(F.col("name_raw")))
    )
    records = (
        records.withColumn("name_hash", content_hash(F.col("name_key")))
        .withColumn("text_hash", content_hash(F.col("norm_text")))
        .withColumn("tokens", tokens_expr(F.col("norm_text")))
    )
    # Context tokens: the text MINUS the name-key tokens (all occurrences,
    # multiplicity preserved — array_except would dedupe and corrupt TF).
    # Name tokens are rare corpus-wide, so IDF weights them HIGH; leaving
    # them in the text vector makes same-name records of DIFFERENT entities
    # (the confounder case the reference trains hardest against,
    # src/training.py:1101-1128 hard negatives) share the dominant cosine
    # mass. Name similarity is its own feature (name_jw/name_lev_sim); the
    # text vector should measure context, the reference's X1-vs-X2
    # person/composite split expressed as a column discipline.
    name_toks = tokens_expr(F.col("name_key"))
    records = records.withColumn(
        "context_tokens",
        F.when(
            F.col("name_key") != "",
            F.filter(
                F.col("tokens"), lambda t: ~F.array_contains(name_toks, t)
            ),
        ).otherwise(F.col("tokens")),
    )
    return records


def turn_equality_check(transcripts: DataFrame, records: DataFrame) -> DataFrame:
    """Per-turn text equality invariant: re-split full_text by '\\n' and compare
    with the source turns under (conv_id, turn_idx) order. Returns a DataFrame
    of violations (empty == invariant holds)."""
    resplit = records.select(
        "conv_id", F.posexplode(F.split("full_text", "\n", -1)).alias("turn_idx", "re_text")
    )
    src = transcripts.select(
        "conv_id", F.col("turn_idx").cast("int").alias("turn_idx"), "text"
    )
    joined = src.join(resplit, ["conv_id", "turn_idx"], "full_outer")
    return joined.where(
        F.col("text").isNull()
        | F.col("re_text").isNull()
        | (F.col("text") != F.col("re_text"))
    )


def string_stats(records: DataFrame) -> dict[str, DataFrame]:
    """Preprocessing-parity side tables (reference pickles, SURVEY §1.1):

    * string_dict  (hash -> value)        — src/preprocessing.py:144-210
    * string_counts(hash -> count)        — src/preprocessing.py:113-114
    * field_hash_mapping(hash, field, n)  — src/preprocessing.py:117-119
    """
    fields = [("name_key", "name_hash"), ("norm_text", "text_hash")]
    unions = None
    for value_col, hash_col in fields:
        part = records.select(
            F.col(hash_col).alias("hash"),
            F.col(value_col).alias("value"),
            F.lit(value_col).alias("field"),
        ).where(F.col("hash").isNotNull())
        unions = part if unions is None else unions.unionByName(part)
    string_dict = unions.dropDuplicates(["hash"]).select("hash", "value")
    string_counts = unions.groupBy("hash").agg(F.count(F.lit(1)).alias("count"))
    field_hash_mapping = unions.groupBy("hash", "field").agg(
        F.count(F.lit(1)).alias("count")
    )
    return {
        "string_dict": string_dict,
        "string_counts": string_counts,
        "field_hash_mapping": field_hash_mapping,
    }
