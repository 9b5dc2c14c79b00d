"""Similarity-search queries (SURVEY.md §2.9) over the embeddings
table: brute-force cosine top-k (oracle-checked), all-pairs cosine
near-dup (oracle-checked), LSH ANN (rows-only, recall-tested vs brute
force in tests/test_similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.similarity import (
    ann_topk_lsh,
    brute_force_topk,
    neardup_pairs_cosine_vectorized,
)
from .registry import fround, register

# DuckDB cosine with explicit per-element double casts — matches the
# engine's zip_with/aggregate double accumulation digit-for-digit.
_DUCK_COS = """
    list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
              for i in generate_series(1, len({a}))]) /
    (sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)
                    for i in generate_series(1, len({a}))])) *
     sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)
                    for i in generate_series(1, len({b}))])))
"""


@register(
    "q40_ann_cosine_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             {_DUCK_COS.format(a='cv', b='qv')} AS cos
      FROM c, q WHERE neighbor_id <> query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT CAST(query_id AS BIGINT)    AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           ROUND(cos, 4)               AS cosine,
           CAST(rnk AS INTEGER)        AS rank
    FROM ranked WHERE rnk <= 10
    """,
    tags=("similarity", "topk"),
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 probe vectors — the ANN ground truth.
    All-JVM array math (zip_with/aggregate in double); the probe side
    is broadcast so the corpus never shuffles for the join."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, queries, k=10)
    return out.select("query_id", "neighbor_id",
                      fround(F.col("cosine")).alias("cosine"), "rank")


@register(
    "q41_embedding_neardup_cosine",
    oracle=f"""
    WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings),
         b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings),
    pairs AS (
      SELECT id_a, id_b, {_DUCK_COS.format(a='va', b='vb')} AS cos
      FROM a, b WHERE id_a < id_b)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           ROUND(cos, 4) AS cosine
    FROM pairs WHERE cos >= 0.4
    """,
    tags=("similarity", "neardup"),
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding near-dup at cosine ≥ 0.4 via the block-matrix
    numpy path (Arrow + applyInPandas, one matmul per chunk-pair block;
    ~50× the interpreted array-expression formulation at sf0.1). Still
    O(n²) — the 100 TB path blocks on an LSH bucket instead
    (operators.similarity.neardup_pairs_cosine with block_col)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = neardup_pairs_cosine_vectorized(emb, threshold=0.4)
    return out.select("id_a", "id_b", fround(F.col("cosine")).alias("cosine"))


@register(
    "q42_ann_topk_lsh",
    oracle=None,  # approximate; recall@k vs q40 asserted in tests
    tags=("similarity", "topk", "lsh"),
)
def ann_topk_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH (4 tables × 8
    planes). Rows-only by nature; tests assert recall@10 ≥ 0.6 against
    the brute-force baseline at this corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ann_topk_lsh(emb, queries, k=10)


@register(
    "q51_ann_topk_ivf",
    oracle=None,  # approximate (quantizer-dependent); recall asserted
                  # vs q40 in tests/test_similarity.py
    tags=("similarity", "topk", "ivf"),
)
def ann_topk_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: KMeans coarse quantizer + n_probe-cell
    candidate scan + exact rerank (operators.similarity.ann_topk_ivf).
    The FAISS-IVF layout expressed relationally: corpus shuffles once
    by cell, probes are an equi-join."""
    from ..operators.similarity import ann_topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ann_topk_ivf(emb, queries, k=10, n_cells=16, n_probe=6)
