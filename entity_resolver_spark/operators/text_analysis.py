"""Text analysis operators for training-data pipelines.

All native column expressions (JVM-side, codegen'd) — language ID heuristic,
quality scoring, token counting, rolling-hash fingerprinting. These extend the
engine beyond the reference's operator set for 100 TB corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny stopword sets per language for the n-gram/stopword language heuristic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "en", "los", "por", "una"],
    "fr": ["le", "la", "les", "des", "est", "dans", "une", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
}

_EN_STOPWORDS = _LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "at", "by"]


def token_count_expr(text: Column) -> Column:
    """Whitespace token count (the cheap pre-tokenizer estimate)."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """BPE-ish subword count: alternating letter-runs / digit-runs /
    punctuation marks, each run counted as ceil(len/4) subwords — a deterministic
    proxy for BPE vocabulary behavior without a tokenizer model."""
    pieces = F.regexp_extract_all(text, F.lit(r"[a-zA-Z]+|\d+|[^\sa-zA-Z\d]"), 0)
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + F.ceil(F.length(p) / 4.0).cast("int"),
    )


def lang_id_expr(text: Column) -> Column:
    """Heuristic language ID: pick the language whose marker-stopword hit
    count is highest (ties -> 'und'). Pure expression: one pass per language
    over the token array."""
    toks = F.filter(F.split(F.lower(text), r"[^\p{L}]+"), lambda t: t != "")

    def marker_hit(arr):
        # closure factory: a 2-arg lambda would be read as (element, index)
        return lambda t: F.array_contains(arr, t)

    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, marker_hit(arr)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score_expr(text: Column) -> Column:
    """Document quality in [0,1]: blends length band, alpha ratio,
    punctuation ratio, stopword ratio, mean word length band — the standard
    C4/Gopher-style heuristics as one expression."""
    n_chars = F.length(text)
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    n_toks = F.size(toks)
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    sw = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))

    len_score = F.when((n_chars >= 50) & (n_chars <= 50000), 1.0).otherwise(0.3)
    alpha_score = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    punct_score = F.when(n_chars > 0, 1.0 - F.least(punct / n_chars * 4, F.lit(1.0))).otherwise(F.lit(0.0))
    stop_score = F.when(n_toks > 0, F.least(stop_hits / n_toks * 3, F.lit(1.0))).otherwise(F.lit(0.0))
    mean_wl = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    wl_score = F.when((mean_wl >= 3) & (mean_wl <= 12), 1.0).otherwise(0.4)
    return (
        0.2 * len_score + 0.25 * alpha_score + 0.2 * punct_score
        + 0.2 * stop_score + 0.15 * wl_score
    )


def fingerprint_expr(text: Column, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min rolling hash over word
    windows — a single 64-bit signature for cheap shift-robust identity."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    windows = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(1), n - window + 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    return F.array_min(windows)


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass scan adding all text-analysis columns."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count_expr(t).alias("n_tokens"),
        bpe_ish_token_count_expr(t).alias("n_subwords"),
        lang_id_expr(t).alias("lang_pred"),
        quality_score_expr(t).alias("quality"),
        fingerprint_expr(t).alias("fingerprint"),
    )
