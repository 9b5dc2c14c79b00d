"""Cleaning-operator queries (SURVEY.md §2.2-2.3, M2), oracle-checked.

The driver tables are clean, so each query first *synthesizes* dirt
with a deterministic CASE (identically on the oracle side), then
applies the engine op — proving the op does something, not just that
identity == identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.cleaning import (
    day_part_expr,
    distinct_counts,
    impute_mean,
    impute_mode,
    na_to_null_expr,
    null_to_unknown_expr,
)
from .registry import fround, register


@register(
    "q12_na_to_null",
    oracle="""
    SELECT NULLIF(CASE WHEN lang = 'en' THEN 'NA' ELSE lang END, 'NA') AS lang_clean,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents
    GROUP BY 1
    """,
    tags=("cleaning",),
)
def na_to_null_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 (``Main.scala:20-25``): "NA" → NULL as a native expression.
    Dirt: 'en' rows become the "NA" sentinel first. The NULL group in
    the output proves the rewrite happened."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.when(F.col("lang") == "en", "NA").otherwise(F.col("lang"))
    return (
        docs.select(na_to_null_expr(dirty).alias("lang_clean"))
        .groupBy("lang_clean")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q13_null_to_unknown",
    oracle="""
    WITH d AS (
      SELECT CASE WHEN source = 'src0' THEN 'Unknow'
                  WHEN source = 'src1' THEN ''
                  WHEN source = 'src2' THEN ' '
                  WHEN source = 'src3' THEN NULL
                  ELSE source END AS s
      FROM documents)
    SELECT CASE WHEN s IS NULL OR s IN ('Unknow', 'None', '', ' ')
                THEN 'unknown' ELSE s END AS source_clean,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d
    GROUP BY 1
    """,
    tags=("cleaning",),
)
def null_to_unknown_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (``Main.scala:13-18``): null/"Unknow"/"None"/""/" " →
    "unknown". Dirt: four source buckets mapped onto the four dirty
    tokens, so every branch of the when-chain is exercised."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = (
        F.when(F.col("source") == "src0", "Unknow")
        .when(F.col("source") == "src1", "")
        .when(F.col("source") == "src2", " ")
        .when(F.col("source") == "src3", F.lit(None).cast("string"))
        .otherwise(F.col("source"))
    )
    return (
        docs.select(null_to_unknown_expr(dirty).alias("source_clean"))
        .groupBy("source_clean")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q14_day_part_bucketize",
    oracle="""
    WITH d AS (
      SELECT CASE WHEN event_id % 97 = 0 THEN 9999
                  ELSE CAST(hour(ts) * 100 + minute(ts) AS INTEGER) END AS hhmm,
             value
      FROM events)
    SELECT CASE WHEN hhmm >= 0    AND hhmm < 500   THEN 'lateNight'
                WHEN hhmm >= 500  AND hhmm < 800   THEN 'earlyMorning'
                WHEN hhmm >= 800  AND hhmm < 1200  THEN 'lateMorning'
                WHEN hhmm >= 1200 AND hhmm < 1400  THEN 'earlyAfternoon'
                WHEN hhmm >= 1400 AND hhmm < 1700  THEN 'lateAfternoon'
                WHEN hhmm >= 1700 AND hhmm < 1900  THEN 'earlyEvening'
                WHEN hhmm >= 1900 AND hhmm < 2100  THEN 'lateEvening'
                WHEN hhmm >= 2100 AND hhmm <= 2400 THEN 'earlyNight'
                ELSE '' END AS day_part,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 4)     AS avg_value
    FROM d
    GROUP BY 1
    """,
    tags=("cleaning", "bucketize"),
)
def day_part_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 (``Main.scala:27-38``): hhmm → 8 day-part buckets, out-of-
    range → "". Dirt: every 97th event gets hhmm=9999 to exercise the
    default branch; the rest derive hhmm from the event timestamp."""
    ev = load_table(spark, sf_dir, "events")
    hhmm = (
        F.when(F.col("event_id") % 97 == 0, F.lit(9999))
        .otherwise((F.hour("ts") * 100 + F.minute("ts")).cast("int"))
    )
    return (
        ev.select(day_part_expr(hhmm).alias("day_part"), "value")
        .groupBy("day_part")
        .agg(F.count(F.lit(1)).alias("n"),
             fround(F.avg("value")).alias("avg_value"))
    )


@register(
    "q15_distinct_counts_single_pass",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT p_partkey     FROM part)) AS BIGINT) AS p_partkey,
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT p_name        FROM part)) AS BIGINT) AS p_name,
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT p_brand       FROM part)) AS BIGINT) AS p_brand,
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT p_type        FROM part)) AS BIGINT) AS p_type,
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT p_size        FROM part)) AS BIGINT) AS p_size,
      CAST((SELECT COUNT(*) FROM (SELECT DISTINCT p_retailprice FROM part)) AS BIGINT) AS p_retailprice,
      CAST(1 AS BIGINT) AS const_col,
      CAST(1 AS BIGINT) AS all_null_col
    """,
    tags=("cleaning", "agg"),
)
def distinct_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 decision input (``Main.scala:184-208``): distinct count of
    EVERY column (null counted as a value) in one aggregation pass —
    the reference runs 2 shuffle jobs per column. A constant column and
    an all-null column are appended; both must report 1 (and would be
    pruned by ``prune_constant_columns``)."""
    part = load_table(spark, sf_dir, "part")
    widened = (part
               .withColumn("const_col", F.lit("x"))
               .withColumn("all_null_col", F.lit(None).cast("string")))
    return distinct_counts(widened)


@register(
    "q16_impute_mean",
    oracle="""
    WITH d AS (
      SELECT CASE WHEN l_linenumber = 3 THEN NULL ELSE l_quantity END AS q
      FROM lineitem),
    m AS (SELECT AVG(q) AS mq FROM d)
    SELECT ROUND(SUM(COALESCE(q, mq)), 4)        AS sum_imputed,
           ROUND(AVG(COALESCE(q, mq)), 4)        AS avg_imputed,
           CAST(COUNT(*) - COUNT(q) AS BIGINT)   AS n_was_null,
           CAST(COUNT(*) AS BIGINT)              AS n_rows
    FROM d, m
    """,
    tags=("cleaning", "impute"),
)
def impute_mean_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/M2 (``Main.scala:273-275``): mean imputation via the
    scalar-subquery pattern (one agg job, broadcast back — no driver
    round-trip). Dirt: every linenumber-3 quantity becomes NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    dirty = li.select(
        F.when(F.col("l_linenumber") == 3, F.lit(None).cast("double"))
        .otherwise(F.col("l_quantity")).alias("q"))
    flagged = dirty.withColumn("was_null", F.col("q").isNull())
    imputed = impute_mean(flagged, ["q"])
    return imputed.agg(
        fround(F.sum("q")).alias("sum_imputed"),
        fround(F.avg("q")).alias("avg_imputed"),
        F.sum(F.col("was_null").cast("long")).alias("n_was_null"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q17_impute_mode",
    oracle="""
    WITH d AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS prio
      FROM orders),
    m AS (
      SELECT prio AS mode_prio FROM d WHERE prio IS NOT NULL
      GROUP BY prio ORDER BY COUNT(*) DESC, prio ASC LIMIT 1)
    SELECT COALESCE(d.prio, m.mode_prio) AS prio,
           CAST(COUNT(*) AS BIGINT)      AS n
    FROM d, m
    GROUP BY 1
    """,
    tags=("cleaning", "impute"),
)
def impute_mode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/M1 (``Main.scala:262-267``): mode imputation with a
    deterministic tie-break (highest count, then smallest value). Dirt:
    every 7th order's priority becomes NULL."""
    orders = load_table(spark, sf_dir, "orders")
    dirty = orders.select(
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority")).alias("prio"))
    return (
        impute_mode(dirty, ["prio"])
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q62_deterministic_hash_split",
    oracle="""
    WITH b AS (
      SELECT lang,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
      FROM documents)
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train' ELSE 'eval' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY 1, 2
    """,
    tags=("split", "sampling"),
)
def deterministic_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/eval split on md5(doc_id) buckets
    (operators.cleaning.deterministic_split) — the oracle recomputes
    the SAME assignment, proving the split is engine-independent (the
    property randomSplit lacks). Counted per (lang, split)."""
    from ..operators.cleaning import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    out = deterministic_split(docs, "doc_id", train_pct=80)
    return (out.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n")))


@register(
    "q63_stratified_sample_counts",
    oracle=None,  # Spark's seeded Bernoulli sampler is engine-specific;
                  # per-stratum tolerance asserted in tests
    tags=("sampling",),
)
def stratified_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus balancing: downsample en/zh to 50%, keep the
    rest (operators.cleaning.stratified_sample); per-lang counts out.
    Deterministic per seed, rows-only for the driver."""
    from ..operators.cleaning import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "lang",
        {"en": 0.5, "zh": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0}, seed=42)
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
