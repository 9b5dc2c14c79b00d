"""Data-quality expectations — the dbt-test / Great-Expectations
check family as composable DataFrame aggregates: each check returns
ONE row (check, n_violations, status) and the suite unions them, so
a whole table's contract evaluates as a handful of aggregate jobs
(most fuse into shared scans when checks share a table).

Design rules:
* A check COUNTS violations rather than failing fast — the pipeline
  decides whether to quarantine, alert, or abort.
* Everything is a plain aggregate/anti-join: uniqueness is a grouped
  HAVING-style count, referential integrity a left-anti join
  (broadcast the parent when it is dimension-sized) — the shapes
  that survive 100 TB.
* NULL semantics are explicit per check (documented on each).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["benford_digits",
           "expect_unique", "expect_not_null", "expect_in_set",
           "expect_range", "expect_subset", "run_expectations"]


def _result(name: str, violations: Column) -> list[Column]:
    v = violations.cast("long")
    return [F.lit(name).alias("check"), v.alias("n_violations"),
            F.when(v == 0, "pass").otherwise("fail").alias("status")]


def expect_unique(df: DataFrame, cols: list[str],
                  name: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per duplicated key (so a
    key seen 3× contributes 2). NULL keys participate as a group —
    duplicate NULLs are duplicates."""
    name = name or f"unique({','.join(cols)})"
    g = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    # SUM over zero groups is NULL -> would read as 'fail' on an
    # empty table; an empty table has zero violations (ADVICE r5)
    return g.agg(*_result(
        name, F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))))


def expect_not_null(df: DataFrame, col: str,
                    name: str | None = None) -> DataFrame:
    name = name or f"not_null({col})"
    return df.agg(*_result(
        name, F.count(F.when(F.col(col).isNull(), 1))))


def expect_in_set(df: DataFrame, col: str, values: list,
                  name: str | None = None) -> DataFrame:
    """NULL is a violation (it is not in the set) — pair with an
    explicit not_null check if NULLs are separately contracted."""
    name = name or f"in_set({col})"
    bad = F.col(col).isNull() | ~F.col(col).isin(values)
    return df.agg(*_result(name, F.count(F.when(bad, 1))))


def expect_range(df: DataFrame, col: str, lo, hi,
                 name: str | None = None) -> DataFrame:
    """Inclusive bounds; NULL passes (range constrains present
    values — chain not_null for presence)."""
    name = name or f"range({col})"
    bad = F.col(col).isNotNull() & ~F.col(col).between(lo, hi)
    return df.agg(*_result(name, F.count(F.when(bad, 1))))


def expect_subset(child: DataFrame, child_col: str, parent: DataFrame,
                  parent_col: str, name: str | None = None,
                  broadcast_parent: bool = True) -> DataFrame:
    """Referential integrity: child values (non-NULL) must exist in
    the parent key set. Violations count CHILD ROWS, not distinct
    orphan keys. Left-anti join on the (deduplicated) parent keys —
    broadcast when the parent is dimension-sized."""
    name = name or f"subset({child_col}->{parent_col})"
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = (child.filter(F.col(child_col).isNotNull())
               .join(keys, child_col, "left_anti"))
    return orphans.agg(*_result(name, F.count(F.lit(1))))


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-significant-digit profile of a positive
    numeric column → one row per digit 1..9: (digit, n_obs, expected,
    contrib) with expected = n·log10(1+1/d) and contrib the digit's
    (o−e)²/e χ² term — the forensic data-quality screen (fabricated or
    truncated numeric columns drift from the Benford curve; Nigrini's
    auditing standard). Σ contrib vs χ²(8) is the caller's test.

    First digit without string ops: d = floor(x / 10^floor(log10 x))
    — pure codegen arithmetic, exact for the doubles Spark and DuckDB
    share. Non-positive/NULL rows are excluded (Benford is defined on
    positive magnitudes). One grouped aggregate + one 1-row broadcast
    for n; no sort, no shuffle beyond the 9-row digit table.
    """
    x = F.col(col).cast("double")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x))))
    obs = (df.filter(x.isNotNull() & (x > 0))
           .groupBy(digit.cast("long").alias("digit"))
           .agg(F.count(F.lit(1)).alias("n_obs")))
    total = obs.agg(F.sum("n_obs").alias("__n"))
    digits = obs.sparkSession.range(1, 10).select(
        F.col("id").alias("digit"))
    exp = (F.col("__n").cast("double")
           * F.log10(1.0 + 1.0 / F.col("digit")))
    o = F.coalesce(F.col("n_obs"), F.lit(0)).cast("double")
    return (digits.join(obs, "digit", "left")
            .crossJoin(F.broadcast(total))
            .select("digit",
                    F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
                    exp.alias("expected"),
                    ((o - exp) * (o - exp) / exp).alias("contrib")))


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check results into the suite report."""
    if not checks:
        raise ValueError("no checks given")
    return reduce(lambda a, b: a.unionByName(b), checks)


def k_anonymity_audit(df: DataFrame, qi_cols: list[str],
                      sensitive_col: str, k: int = 5,
                      l_div: int = 3) -> DataFrame:
    """Privacy audit for a table about to leave the trust boundary
    (training-data releases, eval-set publication): k-anonymity
    (Sweeney 2002) and distinct l-diversity (Machanavalingam et al.
    2007) over one quasi-identifier set.

    A row is k-anonymous when its QI combination is shared by ≥ k
    rows; a QI group is l-diverse when it contains ≥ l distinct
    sensitive values (k-anonymity alone leaks the sensitive attribute
    when a group is homogeneous). Returns one (metric, value) row
    each for: group count, minimum group size, groups below k,
    rows below k, minimum distinct-sensitive per group, groups below
    l — the numbers a release gate thresholds on.

    Plan: ONE aggregation by the QI columns (count + exact distinct
    of the sensitive column ride the same shuffle), then a tiny
    all-group summary. 100 TB: group cardinality is the QI domain,
    not the row count; the only full-data pass is the first combine-
    enabled aggregate. All-integer outputs — oracle-exact by
    construction.
    """
    groups = (df.groupBy(*qi_cols)
              .agg(F.count(F.lit(1)).alias("__n"),
                   F.countDistinct(sensitive_col).alias("__l")))
    return (groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("__n").alias("min_group"),
        F.count(F.when(F.col("__n") < k, 1)).alias("n_groups_below_k"),
        F.coalesce(F.sum(F.when(F.col("__n") < k, F.col("__n"))),
                   F.lit(0)).alias("n_rows_below_k"),
        F.min("__l").alias("min_l"),
        F.count(F.when(F.col("__l") < l_div, 1)).alias("n_groups_below_l"))
        .select(F.explode(F.map_from_arrays(
            F.array(*[F.lit(c) for c in
                      ("n_groups", "min_group", "n_groups_below_k",
                       "n_rows_below_k", "min_l", "n_groups_below_l")]),
            F.array(F.col("n_groups"), F.col("min_group"),
                    F.col("n_groups_below_k"), F.col("n_rows_below_k"),
                    F.col("min_l"), F.col("n_groups_below_l"))))
            .alias("metric", "value")))
