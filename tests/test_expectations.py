"""Data-quality expectations (operators.expectations) — violation
counting semantics per check, NULL conventions, planted failures,
and the broadcast anti-join shape for referential integrity."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.expectations import (
    expect_in_set,
    expect_not_null,
    expect_range,
    expect_subset,
    expect_unique,
    run_expectations,
)


def test_expectation_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (1, "b", -2), (2, None, 50), (None, "a", 200),
         (None, "c", None)],
        "k long, s string, v long")
    out = {r.check: r for r in run_expectations([
        expect_unique(df, ["k"]),          # k: 1×2, NULL×2 → 2 extras
        expect_not_null(df, "s"),          # one NULL
        expect_in_set(df, "s", ["a", "b"]),  # NULL + 'c' → 2
        expect_range(df, "v", 0, 100),     # -2 and 200; NULL passes
    ]).collect()}
    assert out["unique(k)"].n_violations == 2
    assert out["unique(k)"].status == "fail"
    assert out["not_null(s)"].n_violations == 1
    assert out["in_set(s)"].n_violations == 2
    assert out["range(v)"].n_violations == 2

    clean = spark.createDataFrame([(1, "a", 5)], "k long, s string, v long")
    ok = {r.check: r.status for r in run_expectations([
        expect_unique(clean, ["k"]),
        expect_not_null(clean, "s"),
    ]).collect()}
    assert set(ok.values()) == {"pass"}


def test_expect_unique_empty_table_passes(spark):
    """ADVICE r5: SUM over zero groups is NULL — an empty table must
    report 0 violations / 'pass', matching the oracle's COALESCE."""
    empty = spark.createDataFrame([], "k long, s string")
    r = expect_unique(empty, ["k"]).collect()[0]
    assert r.n_violations == 0
    assert r.status == "pass"


def test_expect_subset_counts_child_rows(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    q = expect_subset(child, "fk", parent, "pk")
    r = q.collect()[0]
    assert r.n_violations == 2          # two rows with orphan key 9
    assert r.status == "fail"           # NULL fk is not a violation
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
