"""Dedup queries (SURVEY.md §2.9): exact, fingerprint, n-gram Jaccard,
MinHash-LSH, SimHash — over the documents table.

The MinHash query's oracle is the *brute-force* pair set: DuckDB can't
reproduce xxhash64, but it can compute exact Jaccard over the same
shingle definition, and the LSH output must equal it (recall loss at
τ=0.6 with 24×2 banding is ~2e-5 per pair — see operators.dedup).
SimHash stays rows-only (hash-specific) and is property-tested in
tests/test_dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import (
    dedup_exact,
    neardup_pairs_exact_jaccard,
    neardup_pairs_minhash,
    neardup_pairs_simhash,
)
from ..operators.textual import fingerprint_expr
from .registry import fround, register

# Shared DuckDB CTE: word-3-shingle exact-Jaccard pairs at τ=0.6 —
# the ground truth for BOTH the brute-force and the MinHash query.
_JACCARD_PAIRS_SQL = """
    WITH words AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents),
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
      GROUP BY 1, 2)
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           ROUND(common * 1.0 / (sa + sb - common), 4) AS jaccard
    FROM pairs
    WHERE common * 1.0 / (sa + sb - common) >= 0.6
"""


@register(
    "q31_dedup_exact",
    oracle="""
    WITH unioned AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
    )
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT)    AS n_copies
    FROM unioned
    GROUP BY text
    """,
    tags=("dedup",),
)
def dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping a canonical (min-id) row per distinct text.
    The corpus is doubled with shifted ids first, so the operator has
    real duplicates to collapse (driver texts are all unique).

    100 TB notes: the window shuffles on the dedup key once; rows never
    hit the driver. For very wide rows, dedup on sha2(text) instead so
    the shuffle carries a 32-byte key (q32 does exactly that).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    out = dedup_exact(doubled, ["text"],
                      canonical_order=[F.col("doc_id").asc()],
                      copies_col="n_copies")
    return out.select("doc_id", "n_copies")


@register(
    "q32_dedup_fingerprint",
    oracle="""
    WITH dirty AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, upper(text) || '   ' FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS BIGINT)
             AS n_unique_fingerprints,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique_raw
    FROM dirty
    """,
    tags=("dedup", "fingerprint"),
)
def dedup_fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-fingerprint dedup (md5 of lower+whitespace-collapsed
    text). Dirt: an upper-cased, space-padded copy of every doc — raw
    distinct sees 2× docs, fingerprint collapses them back."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dirty = docs.unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat(F.upper("text"), F.lit("   ")).alias("text")))
    return dirty.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(fingerprint_expr(F.col("text")))
         .alias("n_unique_fingerprints"),
        F.countDistinct("text").alias("n_unique_raw"),
    )


@register(
    "q33_neardup_jaccard_bruteforce",
    oracle=_JACCARD_PAIRS_SQL,
    tags=("dedup", "neardup"),
)
def neardup_bruteforce_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (word-3-shingle) Jaccard near-dup pairs at τ=0.6
    via the shingle inverted index — the LSH recall baseline."""
    docs = load_table(spark, sf_dir, "documents")
    out = neardup_pairs_exact_jaccard(docs, "doc_id", "text", threshold=0.6)
    return out.select("id_a", "id_b", fround(F.col("jaccard")).alias("jaccard"))


@register(
    "q34_neardup_minhash_lsh",
    oracle=_JACCARD_PAIRS_SQL,
    tags=("dedup", "neardup", "lsh"),
)
def neardup_minhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified at τ=0.6 — must equal
    the brute-force oracle pair set (precision is exact by
    construction; recall loss ~2e-5/pair at this banding)."""
    docs = load_table(spark, sf_dir, "documents")
    out = neardup_pairs_minhash(docs, "doc_id", "text", threshold=0.6,
                                num_hashes=48, bands=24)
    return out.select("id_a", "id_b", fround(F.col("jaccard")).alias("jaccard"))


@register(
    "q35_neardup_simhash",
    oracle=None,  # xxhash64-specific; property-tested in tests/test_dedup.py
    tags=("dedup", "neardup", "simhash"),
)
def neardup_simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-distance near-dup pairs (≤ 6 of 64 bits) via
    16-bit chunk LSH. Rows-only: the signature depends on Spark's
    xxhash64, which no oracle reproduces."""
    docs = load_table(spark, sf_dir, "documents")
    return neardup_pairs_simhash(docs, "doc_id", "text", max_hamming=6)


@register(
    "q71_decontamination_and_leakage_split",
    oracle=None,  # self-checking against planted contamination
    tags=("dedup", "decontamination", "split"),
)
def decontamination_and_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two leakage guards a training-data lake runs before every model
    build, driver-visible and self-checking:

    1. **Benchmark decontamination** (operators.dedup.decontaminate):
       the 'test set' is every 50th document verbatim, so each test doc
       trivially contaminates its own training copy — the operator must
       flag ALL of them (``planted_found_ok``); extra flags are real
       shingle collisions, reported not asserted.
    2. **Leakage-safe split** (operators.dedup.leakage_safe_split):
       split on the near-dup CLUSTER id, then count pairs whose ends
       landed in different splits — must be 0 (``leak_free``), the
       property per-doc hash splits do not have.
    """
    from ..operators.dedup import decontaminate, leakage_safe_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    test = docs.filter(F.col("doc_id") % 50 == 0)
    flagged = decontaminate(docs, test)
    n_test = test.agg(F.count(F.lit(1)).alias("n_test"))
    n_flag = flagged.agg(F.count(F.lit(1)).alias("n_flagged"))
    planted = (test.select(F.col("doc_id").alias("train_id"))
               .join(flagged, "train_id", "left_anti")
               .agg(F.count(F.lit(1)).alias("n_planted_missed")))

    pairs = neardup_pairs_minhash(docs, "doc_id", "text", threshold=0.6)
    split = leakage_safe_split(docs, pairs).select(
        F.col("doc_id"), F.col("split"))
    a = split.withColumnRenamed("doc_id", "id_a") \
        .withColumnRenamed("split", "split_a")
    b = split.withColumnRenamed("doc_id", "id_b") \
        .withColumnRenamed("split", "split_b")
    cross = (pairs.join(a, "id_a").join(b, "id_b")
             .filter(F.col("split_a") != F.col("split_b"))
             .agg(F.count(F.lit(1)).alias("n_cross_split_pairs")))
    n_pairs = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    return (n_test.crossJoin(n_flag).crossJoin(planted)
            .crossJoin(n_pairs).crossJoin(cross)
            .withColumn("planted_found_ok", F.col("n_planted_missed") == 0)
            .withColumn("leak_free", F.col("n_cross_split_pairs") == 0))


@register(
    "q53_neardup_clusters",
    oracle=f"""
    WITH pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs),
    verts AS (SELECT DISTINCT src AS id FROM edges)
    , reach AS (
      WITH RECURSIVE r(id, label) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.src, r.label
        FROM edges e JOIN r ON e.dst = r.id
        WHERE r.label < e.src)
      SELECT id, MIN(label) AS cluster_id FROM r GROUP BY id)
    SELECT CAST(id AS BIGINT) AS id, CAST(cluster_id AS BIGINT) AS cluster_id
    FROM reach
    """,
    tags=("dedup", "neardup", "clustering"),
)
def neardup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash near-dup pair graph —
    iterative min-label propagation (operators.dedup.neardup_clusters)
    must agree with DuckDB's recursive-CTE reachability on every
    (vertex, min-reachable-id) row. Iterative DataFrame algorithm vs
    recursive SQL: the strongest cross-paradigm differential here."""
    from ..operators.dedup import neardup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = neardup_pairs_minhash(docs, "doc_id", "text", threshold=0.6)
    return neardup_clusters(pairs)
