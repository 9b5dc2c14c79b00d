"""Grouped isotonic regression (operators.regression) — independent
minimax cross-check, monotonicity/projection properties, tie pooling,
per-group isolation."""

from __future__ import annotations

import random

import pytest

from bigdata_spark_assignment_spark.operators.regression import (
    _pav,
    isotonic_fit,
)


def _pav_minimax(y, w):
    """Independent exact reference via the classic minimax
    characterization of the isotonic L2 projection:
    fit_i = max_{j<=i} min_{k>=i} weightedmean(y[j..k]). O(n³)."""
    n = len(y)

    def wmean(j, k):
        num = sum(y[t] * w[t] for t in range(j, k + 1))
        den = sum(w[t] for t in range(j, k + 1))
        return num / den

    return [max(min(wmean(j, k) for k in range(i, n))
                for j in range(i + 1))
            for i in range(n)]


def test_pav_stack_matches_minimax_random():
    rng = random.Random(3)
    for _ in range(60):
        n = rng.randint(1, 12)
        y = [rng.uniform(-5, 5) for _ in range(n)]
        w = [float(rng.randint(1, 3)) for _ in range(n)]
        fit = _pav(y, w)
        want = _pav_minimax(y, w)
        assert fit == pytest.approx(want)
        # monotone non-decreasing
        assert all(a <= b + 1e-12 for a, b in zip(fit, fit[1:]))
        # weighted mass preserved (projection property)
        assert sum(f * wi for f, wi in zip(fit, w)) == pytest.approx(
            sum(yi * wi for yi, wi in zip(y, w)))


def test_isotonic_fit_known_case_and_groups(spark):
    rows = [
        # group a: violation 4,2 pools to 3,3
        ("a", 1.0, 1.0), ("a", 2.0, 4.0), ("a", 3.0, 2.0),
        ("a", 4.0, 5.0),
        # group b: already monotone -> unchanged
        ("b", 1.0, 0.0), ("b", 2.0, 1.0),
        # tie at x=1 in c pools to mean 2.0 first
        ("c", 1.0, 1.0), ("c", 1.0, 3.0), ("c", 2.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = isotonic_fit(df, "k", "x", "y").collect()
    got = {}
    for r in out:
        got.setdefault(r.group, {})[(r.x, r.y)] = r.y_iso
    assert got["a"][(1.0, 1.0)] == pytest.approx(1.0)
    assert got["a"][(2.0, 4.0)] == pytest.approx(3.0)
    assert got["a"][(3.0, 2.0)] == pytest.approx(3.0)
    assert got["a"][(4.0, 5.0)] == pytest.approx(5.0)
    assert got["b"][(1.0, 0.0)] == 0.0 and got["b"][(2.0, 1.0)] == 1.0
    # c: tie at x=1 pools to mean 2.0 with WEIGHT 2; the violation
    # with y(2)=1 then pools to (2*2 + 1*1)/3 = 5/3
    assert got["c"][(1.0, 1.0)] == pytest.approx(5 / 3)
    assert got["c"][(1.0, 3.0)] == pytest.approx(5 / 3)
    assert got["c"][(2.0, 1.0)] == pytest.approx(5 / 3)
    # fit is a function of x: both tie rows share one fitted value
    assert got["c"][(1.0, 1.0)] == got["c"][(1.0, 3.0)]
