"""SCD2 history/merge and heavy-hitters operator contracts."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.relational import (
    scd2_history,
    scd2_merge,
)
from bigdata_spark_assignment_spark.operators.sketches import heavy_hitters


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


CHANGES = [
    # key 1: a→a (no-op) →b, then batch: b (no-op) →c
    (1, 1, "a", _ts(0)), (1, 2, "a", _ts(5)), (1, 3, "b", _ts(10)),
    (1, 7, "b", _ts(40)), (1, 8, "c", _ts(45)),
    # key 2: only history, untouched by batch
    (2, 4, "x", _ts(1)), (2, 5, "y", _ts(2)),
    # key 3: new key arriving only in the batch, with internal no-op
    (3, 9, "q", _ts(41)), (3, 10, "q", _ts(50)), (3, 11, "r", _ts(55)),
    # key 4: NULL attr versions (null-safe compare: NULL→NULL is no-op)
    (4, 6, None, _ts(3)), (4, 12, None, _ts(42)), (4, 13, "z", _ts(44)),
]
SCHEMA = "user_id long, event_id long, tier string, ts timestamp"
CUTOFF = _ts(30)


def _rows(df):
    return sorted(
        ((r.user_id, r.tier, r.valid_from, r.valid_to, r.is_current)
         for r in df.select("user_id", "tier", "valid_from", "valid_to",
                            "is_current").collect()),
        key=repr)


def test_scd2_merge_equals_full_rebuild(spark):
    """The q73 invariant on a hand-built log covering every edge:
    cross-boundary no-op, batch-only key, untouched key, NULL attrs."""
    log = spark.createDataFrame(CHANGES, SCHEMA)
    full = scd2_history(log, ["user_id"], ["tier"], "ts", ["event_id"])
    hist = scd2_history(log.filter(F.col("ts") < F.lit(CUTOFF)),
                        ["user_id"], ["tier"], "ts", ["event_id"])
    merged = scd2_merge(hist, log.filter(F.col("ts") >= F.lit(CUTOFF)),
                        ["user_id"], ["tier"], "ts", ["event_id"])
    assert _rows(merged) == _rows(full)


def test_scd2_history_shape(spark):
    log = spark.createDataFrame(CHANGES, SCHEMA)
    hist = scd2_history(log, ["user_id"], ["tier"], "ts", ["event_id"])
    rows = _rows(hist)
    # key 1 collapses a,a → one version; versions chain a→b→c
    k1 = sorted((r for r in rows if r[0] == 1), key=lambda r: r[2])
    assert [t for (_, t, *_) in k1] == ["a", "b", "c"]
    assert k1[0][3] == k1[1][2]  # valid_to chains to next valid_from
    assert [r[4] for r in k1] == [False, False, True]
    # key 4: NULL→NULL collapsed (null-safe), then z
    k4 = sorted((r for r in rows if r[0] == 4), key=lambda r: r[2])
    assert [t for (_, t, *_) in k4] == [None, "z"]
    # exactly one current row per key
    cur = [r for r in rows if r[4]]
    assert len(cur) == 4


def test_scd2_merge_batch_all_noop(spark):
    """A batch holding only a repeat of the current attrs must leave
    the history byte-identical (open row stays open)."""
    log = spark.createDataFrame(
        [(1, 1, "a", _ts(0)), (1, 2, "b", _ts(5))], SCHEMA)
    batch = spark.createDataFrame([(1, 3, "b", _ts(50))], SCHEMA)
    hist = scd2_history(log, ["user_id"], ["tier"], "ts", ["event_id"])
    merged = scd2_merge(hist, batch, ["user_id"], ["tier"], "ts",
                        ["event_id"])
    assert _rows(merged) == _rows(hist)


def test_heavy_hitters_exact_vs_groupby(spark):
    """Sketch-pruned result must equal the naive plan exactly."""
    # zipf-ish: item i appears 1000//i times
    rows = [(f"t{i}",) for i in range(1, 60) for _ in range(1000 // i)]
    df = spark.createDataFrame(rows, "item string")
    got = {(r.item, r.cnt)
           for r in heavy_hitters(df, "item", threshold=50,
                                  capacity=64).collect()}
    want = {(r.item, r.cnt)
            for r in df.groupBy("item").agg(
                F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 50).collect()}
    assert got == want and len(want) == 20  # 1000//i >= 50 ⇔ i <= 20


def test_heavy_hitters_fallback_warns(spark):
    """capacity too small for n/threshold → exact fallback + warning,
    result still correct."""
    rows = [(f"t{i % 40}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "item string")
    with pytest.warns(RuntimeWarning, match="falling back"):
        got = {(r.item, r.cnt)
               for r in heavy_hitters(df, "item", threshold=10,
                                      capacity=8).collect()}
    assert got == {(f"t{i}", 100) for i in range(40)}


def test_heavy_hitters_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 10 + [("b",)] * 2,
        "item string")
    got = {(r.item, r.cnt)
           for r in heavy_hitters(df, "item", threshold=3,
                                  capacity=16).collect()}
    assert got == {("a", 5)}
