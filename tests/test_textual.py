"""Unit tests for text-analysis operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.textual import (
    bpe_ish_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    shingles_expr,
    token_count_expr,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr(F.col("text")).alias("v")).first().v


def test_token_counts(spark):
    assert _one(spark, "a b  c", token_count_expr) == 3
    assert _one(spark, "Hello, world! (test)", bpe_ish_token_count_expr) == 3


def test_shingles_short_doc_empty(spark):
    assert _one(spark, "one two", lambda c: shingles_expr(c, 3)) == []
    assert _one(spark, "one two three four", lambda c: shingles_expr(c, 3)) == \
        ["one two three", "two three four"]


def test_fingerprint_normalizes_case_and_ws(spark):
    a = _one(spark, "Hello   World", fingerprint_expr)
    b = _one(spark, "hello world  ", fingerprint_expr)
    c = _one(spark, "hello earth", fingerprint_expr)
    assert a == b != c


def test_lang_id_markers(spark):
    assert _one(spark, "the cat and the dog is here", lang_id_expr) == "en"
    assert _one(spark, "el perro y la casa que tiene", lang_id_expr) == "es"
    assert _one(spark, "der hund und die katze ist da", lang_id_expr) == "de"
    assert _one(spark, "le chat et les maisons des gens", lang_id_expr) == "fr"
    assert _one(spark, "你好世界", lang_id_expr) == "zh"
    assert _one(spark, "xyzzy plugh", lang_id_expr) == "und"


def test_quality_score_range(spark):
    v = _one(spark, "the quick brown fox and the lazy dog " * 10,
             quality_score_expr)
    assert 0.0 <= v <= 1.0
    junk = _one(spark, "!!!???...;;;", quality_score_expr)
    assert junk < v
