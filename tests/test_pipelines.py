"""Corpus-prep pipeline: stages compose, counts are monotone, planted
dirt is removed."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.io import load_table
from bigdata_spark_assignment_spark.pipelines import prepare_corpus


def test_prepare_corpus_end_to_end(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    # plant dirt: an exact copy (shifted id) and a case-mangled copy
    dirty = docs.unionByName(
        docs.limit(20).select((F.col("doc_id") + 100000).alias("doc_id"),
                              F.upper("text").alias("text"),
                              "lang", "source", "n_chars"))
    clean, stats = prepare_corpus(dirty, min_quality=0.0)
    s = {r.stage: r.n_docs for r in stats.collect()}
    assert s["input"] == docs.count() + 20
    # fingerprint dedup kills the case-mangled copies
    assert s["exact_dedup"] == docs.count()
    # near-dup prune is monotone non-increasing
    assert s["neardup_prune"] <= s["exact_dedup"]
    assert s["quality_filter"] == clean.count()
    # metadata columns present and populated
    row = clean.first()
    assert row.pred_lang is not None and row.ws_tokens > 0
    assert 0.0 <= row.quality <= 1.0
    # canonical rows only: no planted ids survive
    assert clean.filter(F.col("doc_id") >= 100000).count() == 0


def test_prepare_corpus_lang_filter(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    clean, stats = prepare_corpus(docs, keep_langs=("en", "und"),
                                  min_quality=0.0)
    langs = {r.pred_lang for r in clean.select("pred_lang").distinct().collect()}
    assert langs <= {"en", "und"}
    s = {r.stage: r.n_docs for r in stats.collect()}
    assert "lang_filter" in s
