"""Text-analysis operators: token counts, lang ID, quality, fingerprints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolver_spark.operators.text_analysis import (
    analyze_documents,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b c",), ("  spaced   out  ",), ("",), ("single",)], ["text"]
    )
    out = [r[0] for r in df.select(token_count_expr(F.col("text"))).collect()]
    assert out == [3, 2, 0, 1]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and the dog is here",),
            ("el gato esta en la casa de los abuelos",),
            ("le chat est dans la maison pour les vacances",),
            ("der hund ist nicht in das haus und der garten",),
            ("zzz qqq xxx",),
        ],
        ["text"],
    )
    out = [r[0] for r in df.select(lang_id_expr(F.col("text"))).collect()]
    assert out == ["en", "es", "fr", "de", "und"]


def test_quality_score_orders_sensibly(spark):
    good = "The quick brown fox jumps over the lazy dog and runs to the hills for a long day."
    bad = "@@@@ #### !!!! $$$$ %%%% ^^^^ &&&& **** (((( ))))"
    df = spark.createDataFrame([(good,), (bad,)], ["text"])
    out = [r[0] for r in df.select(quality_score_expr(F.col("text"))).collect()]
    assert out[0] > out[1]
    assert 0.0 <= out[1] <= out[0] <= 1.0


def test_fingerprint_shift_robust(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    shifted = "PREFIX " + base  # fingerprint = min window hash; shift keeps windows
    df = spark.createDataFrame([(base,), (shifted,)], ["text"])
    fps = [r[0] for r in df.select(fingerprint_expr(F.col("text"))).collect()]
    assert fps[0] == fps[1]


def test_analyze_documents_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = analyze_documents(docs)
    row = out.agg(
        F.min("n_tokens"), F.min("quality"), F.max("quality"), F.count(F.lit(1))
    ).collect()[0]
    assert row[3] == docs.count()
    assert row[0] >= 0 and 0.0 <= row[1] <= row[2] <= 1.0


def test_bpe_ish_subword_count(spark):
    """Letter/digit runs count ceil(len/4); punctuation counts 1 each."""
    from entity_resolver_spark.operators.text_analysis import (
        bpe_ish_token_count_expr,
    )

    cases = [
        ("hello", 2),            # 5 letters -> ceil(5/4)=2
        ("hi", 1),
        ("hello world", 4),      # ceil(5/4) + ceil(5/4)
        ("abc-123", 3),          # 1 + 1(punct) + 1
        ("internationalization", 5),  # 20 -> 5
        ("", 0),
        ("!!!", 3),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["t"])
    rows = df.select("t", bpe_ish_token_count_expr(F.col("t")).alias("n")).collect()
    got = {r["t"]: r["n"] for r in rows}
    for text, exp in cases:
        assert got[text] == exp, (text, got[text], exp)
