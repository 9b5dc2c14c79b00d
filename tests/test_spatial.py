"""Grid-blocked radius join (operators.spatial) — brute-force
equivalence (incl. negative coordinates and exact-boundary pairs),
single-offset pair generation (no dedup needed), isolated points in
the stats, and the no-cartesian plan pin."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.spatial import (
    radius_join_grid,
    radius_neighbor_stats,
)


def _brute(pts, r2):
    out = set()
    for (ia, xa, ya), (ib, xb, yb) in itertools.permutations(pts, 2):
        if (xa - xb) ** 2 + (ya - yb) ** 2 <= r2:
            out.add((ia, ib))
    return out


def test_radius_join_matches_bruteforce_with_negatives(spark):
    rng = random.Random(7)
    pts = [(i, rng.randint(-200, 200), rng.randint(-200, 200))
           for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {(r.id, r.neighbor_id)
           for r in radius_join_grid(df, "id", "x", "y", 30).collect()}
    assert got == _brute(pts, 900)


def test_radius_join_boundary_and_single_generation(spark):
    # dist² exactly r² is IN; a pair in the same cell is generated once
    pts = [(1, 0, 0), (2, 3, 4), (3, 0, 5), (4, 0, 6)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    rows = radius_join_grid(df, "id", "x", "y", 5).collect()
    got = {(r.id, r.neighbor_id): r.dist2 for r in rows}
    assert len(rows) == len(got)          # no duplicate pairs
    assert got[(1, 2)] == 25              # 3-4-5 triangle, boundary in
    assert got[(1, 3)] == 25 and (1, 4) not in got
    assert (2, 1) in got                  # directed: both orders


def test_radius_neighbor_stats_isolated_points(spark):
    pts = [(1, 0, 0), (2, 1, 0), (3, 500, 500)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = {r.id: r for r in
           radius_neighbor_stats(df, "id", "x", "y", 10).collect()}
    assert out[1].n_neighbors == 1 and out[1].min_dist2 == 1
    assert out[3].n_neighbors == 0 and out[3].min_dist2 is None


def test_radius_join_plan_is_equijoin_not_cartesian(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 17).alias("x"),
        (F.col("id") % 13).alias("y"))
    plan = (radius_join_grid(df, "id", "x", "y", 4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
