"""Composed-pipeline query: the corpus-prep flow's stage counts,
checked end-to-end against a DuckDB oracle that re-derives every stage
in SQL (fingerprint canonicalization → word-3-shingle Jaccard pair
prune at τ=0.6 → quality filter).

This is the strongest correctness statement in the repo: four chained
operators (two of them shuffle-heavy, one LSH-approximate) must agree
with a straight-line SQL re-derivation on row counts at every stage.
The LSH step's miss probability at τ=0.6 with 24×2 banding is ~2e-5
per pair — statistically invisible at driver scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..pipelines import prepare_corpus
from .registry import register

_QUALITY_EXPR = """
    (CASE WHEN length(text) BETWEEN 120 AND 20000 THEN 1.0 ELSE 0.0 END
     + GREATEST(0.0, 1.0 - (CAST(len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS DOUBLE)
                            / CAST(length(text) AS DOUBLE)) * 5.0)
     + CASE WHEN len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) >= 2
            THEN 1.0 ELSE 0.0 END
     + CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
       / CAST(length(text) AS DOUBLE)
    ) * 0.25
"""

_CORPUS_PREP_ORACLE = f"""
    WITH canon AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
    kept AS (
      SELECT d.* FROM documents d JOIN canon USING (doc_id)),
    words AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM kept),
    sh AS (
      SELECT doc_id,
             list_distinct([concat_ws(' ', w[i], w[i+1], w[i+2])
                            for i in generate_series(1, len(w) - 2)]) AS s
      FROM words WHERE len(w) >= 3),
    ex AS (SELECT doc_id, unnest(s) AS shingle, len(s) AS sz FROM sh),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common,
             ANY_VALUE(a.sz) AS sa, ANY_VALUE(b.sz) AS sb
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    drops AS (
      SELECT DISTINCT id_b FROM pairs
      WHERE common * 1.0 / (sa + sb - common) >= 0.6),
    nd AS (
      SELECT * FROM kept WHERE doc_id NOT IN (SELECT id_b FROM drops)),
    qf AS (
      SELECT * FROM nd WHERE {_QUALITY_EXPR} >= 0.3)
    SELECT 'input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    UNION ALL
    SELECT 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM kept
    UNION ALL
    SELECT 'neardup_prune', CAST(COUNT(*) AS BIGINT) FROM nd
    UNION ALL
    SELECT 'quality_filter', CAST(COUNT(*) AS BIGINT) FROM qf
"""


@register(
    "q52_corpus_prep_stats",
    oracle=_CORPUS_PREP_ORACLE,
    tags=("pipeline", "dedup", "text"),
)
def corpus_prep_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage counts of the composed corpus-prep pipeline
    (pipelines.prepare_corpus): fingerprint dedup → MinHash near-dup
    prune → quality ≥ 0.3. Every stage row-count must equal the
    oracle's straight-line SQL re-derivation."""
    # fan_out: the pipeline's first stage fingerprints + shingles
    # every doc — per-byte scan work (io.scan_fanout)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    _, stats = prepare_corpus(docs, min_quality=0.3)
    return stats
