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


def test_prepare_corpus_cluster_drops_superset_of_pairdrop(spark, sf_smoke):
    """Clustering canonicalization must remove every doc pair-drop
    removes, and may remove more (a doc smaller than all its direct
    neighbors but not its cluster min)."""
    from bigdata_spark_assignment_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents")
    pair_kept, _ = prepare_corpus(docs, min_quality=0.0)
    clus_kept, _ = prepare_corpus(docs, min_quality=0.0, cluster=True)
    pk = {r.doc_id for r in pair_kept.select("doc_id").collect()}
    ck = {r.doc_id for r in clus_kept.select("doc_id").collect()}
    assert ck <= pk


def test_prepare_corpus_mask_and_chunk(spark, sf_smoke):
    from bigdata_spark_assignment_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents")
    out, stats = prepare_corpus(docs, min_quality=0.0, mask_pii=True,
                                chunk_tokens=32, chunk_overlap=8)
    rows = out.limit(50).collect()
    assert {"doc_id", "chunk_id", "chunk_text", "n_tokens",
            "pred_lang", "quality"} <= set(out.columns)
    assert all(r.n_tokens <= 32 for r in rows)
    st = {r.stage: r.n_docs for r in stats.collect()}
    assert st["chunk"] >= st["quality_filter"]  # chunking fans out


def test_neardup_clusters_warns_on_non_convergence(spark):
    import warnings

    from bigdata_spark_assignment_spark.operators.dedup import (
        neardup_clusters,
    )
    # path graph 0-1-2-...-9: min-label needs ~8 rounds to reach the end
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(9)],
        "id_a long, id_b long, jaccard double")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = neardup_clusters(pairs, max_iter=2).collect()
    assert any("NOT converged" in str(x.message) for x in w)
    assert len(out) == 10
    # converged run: everything labeled 0, no warning
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        ok = neardup_clusters(pairs, max_iter=20).collect()
    assert not any("NOT converged" in str(x.message) for x in w2)
    assert {r.cluster_id for r in ok} == {0}
