"""Fellegi-Sunter record linkage (operators/linkage.py)."""

import math

import pytest
from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.linkage import (
    FieldComparison,
    fs_link,
)


def _sources(spark):
    a = spark.createDataFrame(
        [(1, "ann lee", "GOLD", 10), (2, "bob roy", "SILVER", 10),
         (3, "cal day", None, 20)],
        ["ida", "name_a", "tier_a", "blk_a"])
    b = spark.createDataFrame(
        [(101, "ANN LEE", "GOLD", 10),     # matches 1: both agree
         (102, "bob ray", "SILVER", 10),   # vs 2: name off, tier agrees
         (103, "cal day", "GOLD", 20),     # vs 3: name agrees, tier NULL
         (104, "zed zed", "IRON", 30)],    # unblocked (no 30 in a)
        ["idb", "name_b", "tier_b", "blk_b"])
    fields = [
        FieldComparison(
            "name",
            F.lower(F.col("l.name_a")) == F.lower(F.col("r.name_b")),
            0.9, 0.01),
        FieldComparison(
            "tier", F.col("l.tier_a") == F.col("r.tier_b"), 0.8, 0.2),
    ]
    return a, b, fields


def test_fs_link_hand_computed_weights_and_decisions(spark):
    """Weights are log2(m/u) / log2((1-m)/(1-u)) summed in field
    order; NULL agreement contributes zero evidence; thresholds split
    match vs possible; below-review pairs are dropped."""
    a, b, fields = _sources(spark)
    wn_a, wn_d = math.log2(0.9 / 0.01), math.log2(0.1 / 0.99)
    wt_a = math.log2(0.8 / 0.2)
    out = {(r.id_a, r.id_b): r for r in
           fs_link(a, b, "ida", "idb", [("blk_a", "blk_b")], fields,
                   match_threshold=6.0, review_threshold=-2.0)
           .collect()}
    # (1,101): name+tier agree
    r = out[(1, 101)]
    assert r.weight == pytest.approx(wn_a + wt_a)
    assert r.decision == "match"
    assert r.name_agree is True and r.tier_agree is True
    # (2,102): name disagrees, tier agrees -> review band
    r = out[(2, 102)]
    assert r.weight == pytest.approx(wn_d + wt_a)
    assert r.decision == "possible"
    # (3,103): name agrees, tier NULL on the a side -> zero evidence
    r = out[(3, 103)]
    assert r.weight == pytest.approx(wn_a)
    assert r.decision == "match"
    assert r.tier_agree is None
    # cross-block and below-review pairs are absent
    assert all(k[1] != 104 for k in out)
    assert (1, 102) not in out  # both fields disagree -> below review


def test_fs_link_blocked_join_no_cartesian(spark):
    """Candidate generation must plan as an equi-join on the block
    key, never a nested-loop cross product."""
    a, b, fields = _sources(spark)
    plan = (fs_link(a, b, "ida", "idb", [("blk_a", "blk_b")], fields,
                    match_threshold=6.0, review_threshold=-2.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
