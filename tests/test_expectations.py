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


def test_k_anonymity_audit_hand_table(spark):
    """Hand table: QI group sizes 3/5, sensitive diversity 3/1 — the
    audit must report min group 3, one group below k=5, its 3 rows,
    min l 1, one group below l=3."""
    from bigdata_spark_assignment_spark.operators.expectations import (
        k_anonymity_audit,
    )

    rows = [("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z"),
            ("b", 2, "x"), ("b", 2, "x"), ("b", 2, "x"),
            ("b", 2, "x"), ("b", 2, "x")]
    df = spark.createDataFrame(rows, "qi1 string, qi2 int, sens string")
    got = {r["metric"]: r["value"]
           for r in k_anonymity_audit(df, ["qi1", "qi2"], "sens",
                                      k=5, l_div=3).collect()}
    assert got == {"n_groups": 2, "min_group": 3,
                   "n_groups_below_k": 1, "n_rows_below_k": 3,
                   "min_l": 1, "n_groups_below_l": 1}
