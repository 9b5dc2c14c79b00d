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


def test_grouped_ols_known_fits_and_guards(spark):
    from bigdata_spark_assignment_spark.operators.regression import (
        grouped_ols,
    )
    rows = [
        # a: exact line y = 2x + 1 -> r2 = 1
        ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0),
        # b: numpy-checked scatter
        ("b", 0.0, 0.0), ("b", 1.0, 2.0), ("b", 2.0, 1.0),
        ("b", 3.0, 3.0),
        # c: single point -> NULL slope
        ("c", 5.0, 5.0),
        # d: zero x-variance -> NULL slope
        ("d", 1.0, 1.0), ("d", 1.0, 2.0),
        # e: flat series (zero y-variance) -> slope 0, r2 = 1
        ("e", 0.0, 7.0), ("e", 1.0, 7.0),
        # f: NULL y rows dropped
        ("f", 0.0, None), ("f", 1.0, 1.0), ("f", 2.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.group: r for r in grouped_ols(df, "k", "x", "y").collect()}
    assert got["a"].slope == pytest.approx(2.0)
    assert got["a"].intercept == pytest.approx(1.0)
    assert got["a"].r2 == pytest.approx(1.0)
    import numpy as np
    bs, bi = np.polyfit([0, 1, 2, 3], [0, 2, 1, 3], 1)
    assert got["b"].slope == pytest.approx(bs)
    assert got["b"].intercept == pytest.approx(bi)
    yb = np.array([0, 2, 1, 3.0])
    pred = bs * np.array([0, 1, 2, 3.0]) + bi
    r2 = 1 - ((yb - pred) ** 2).sum() / ((yb - yb.mean()) ** 2).sum()
    assert got["b"].r2 == pytest.approx(r2)
    assert got["c"].slope is None and got["c"].r2 is None
    assert got["d"].slope is None
    assert got["e"].slope == pytest.approx(0.0)
    assert got["e"].r2 == pytest.approx(1.0)
    assert got["f"].n == 2 and got["f"].slope == pytest.approx(2.0)


def test_theil_sen_matches_scipy_formulation(spark):
    from bigdata_spark_assignment_spark.operators.regression import (
        theil_sen_slope,
    )
    import itertools
    import statistics

    rows = [("g", float(i), v) for i, v in
            enumerate([1.0, 2.0, 100.0, 4.0, 5.0, 6.0])]  # one outlier
    rows += [("h", 1.0, 1.0), ("h", 1.0, 2.0)]  # all x ties -> no pairs
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.group: r for r in theil_sen_slope(df, "k", "x", "y").collect()}
    ys = [1.0, 2.0, 100.0, 4.0, 5.0, 6.0]
    slopes = [round((ys[j] - ys[i]) / (j - i), 9)
              for i, j in itertools.combinations(range(6), 2)]
    assert got["g"].n_pairs == 15
    assert got["g"].slope == pytest.approx(statistics.median(slopes))
    # the outlier cannot drag the robust slope off ~1
    assert abs(got["g"].slope - 1.0) < 0.35
    assert got["h"].n_pairs == 0 and got["h"].slope is None


def test_mann_kendall_signs_and_ties(spark):
    from bigdata_spark_assignment_spark.operators.regression import (
        mann_kendall,
    )
    rows = (
        # up: strictly increasing, n=5 -> S = 10, Var = 5*4*15/18
        [("up", float(i), float(i)) for i in range(5)]
        # down: strictly decreasing -> S = -10
        + [("dn", float(i), float(-i)) for i in range(5)]
        # tie: all equal y -> S = 0, Var <= 0 -> z NULL
        + [("tie", float(i), 1.0) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r.group: r for r in mann_kendall(df, "k", "x", "y").collect()}
    import math
    var5 = 5 * 4 * 15 / 18.0
    assert got["up"].s_stat == 10
    assert got["up"].z_stat == pytest.approx((10 - 1) / math.sqrt(var5))
    assert got["dn"].s_stat == -10
    assert got["dn"].z_stat == pytest.approx((-10 + 1) / math.sqrt(var5))
    # all-tied y: tie term equals the n term exactly -> Var = 0
    assert got["tie"].s_stat == 0 and got["tie"].z_stat is None


def test_benford_digits_known_distribution(spark):
    from bigdata_spark_assignment_spark.operators.expectations import (
        benford_digits,
    )
    import math
    # powers scaled so first digits are 1,2,3,1 (0 and negatives drop)
    vals = [1.5, 23.0, 0.31, 1000.0, 0.0, -7.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r.digit: r for r in benford_digits(df, "x").collect()}
    assert len(rows) == 9                      # all digits present
    assert rows[1].n_obs == 2 and rows[2].n_obs == 1 and rows[3].n_obs == 1
    assert rows[9].n_obs == 0
    n = 4
    for d in range(1, 10):
        e = n * math.log10(1 + 1 / d)
        assert rows[d].expected == pytest.approx(e)
        assert rows[d].contrib == pytest.approx(
            (rows[d].n_obs - e) ** 2 / e)


def test_categorical_mi_and_cramers_v(spark):
    from bigdata_spark_assignment_spark.operators.relational import (
        categorical_mi_cells,
        cramers_v,
    )
    import math
    # perfectly dependent: a determines b -> MI = H(a), V = 1
    dep = spark.createDataFrame(
        [("x", "p")] * 3 + [("y", "q")] * 1, "a string, b string")
    cells = categorical_mi_cells(dep, "a", "b").collect()
    mi = sum(r.n_ab / r.n * r.pmi for r in cells)
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert mi == pytest.approx(h)
    v = cramers_v(dep, "a", "b").collect()[0]
    assert v.v == pytest.approx(1.0)
    # independent 2x2 with equal counts -> MI = 0, V = 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq"], "a string, b string")
    cells = categorical_mi_cells(ind, "a", "b").collect()
    assert sum(r.n_ab / r.n * r.pmi for r in cells) == pytest.approx(0.0)
    assert cramers_v(ind, "a", "b").collect()[0].v == pytest.approx(0.0)


def test_weighted_percentiles_step_numpy_parity(spark):
    from bigdata_spark_assignment_spark.operators.relational import (
        weighted_percentiles_step,
    )
    import numpy as np
    rng = np.random.RandomState(7)
    vals = rng.uniform(0, 100, 200).round(3)
    wts = rng.randint(1, 9, 200)
    rows = [("g", float(v), int(w)) for v, w in zip(vals, wts)]
    rows += [("tiny", 5.0, 1), ("tiny", 1.0, 3)]  # cum: 1.0->3, 5.0->4
    df = spark.createDataFrame(rows, "k string, v double, w long")
    out = {r.k: r for r in weighted_percentiles_step(
        df, ["k"], "v", "w", [0.25, 0.5, 0.75]).collect()}

    # numpy reference: smallest v with cumweight >= p * W
    order = np.argsort(vals, kind="stable")
    sv, sw = vals[order], wts[order]
    # pool equal values like the operator's distinct-value table
    uv = np.unique(sv)
    cw = np.array([sw[sv == u].sum() for u in uv]).cumsum()
    for p, col in [(0.25, "wp25"), (0.5, "wp50"), (0.75, "wp75")]:
        want = uv[np.searchsorted(cw, p * cw[-1])]
        assert out["g"][col] == pytest.approx(float(want)), (p, col)
    # hand case: W=4; p50 target 2 -> first cum>=2 is v=1; p75 -> 3 -> v=1
    assert out["tiny"].wp50 == 1.0
    assert out["tiny"].wp75 == 1.0
    assert out["tiny"].wp25 == 1.0


def test_split_conformal_ols_guarantee_and_order_statistic(spark):
    """Planted linear data with uniform noise: the fit recovers the
    line, q̂ equals the hand-computed order statistic of calibration
    residuals, and test coverage sits near 1 − α."""
    import numpy as np

    from bigdata_spark_assignment_spark.operators.regression import (
        split_conformal_ols,
    )

    rng = np.random.RandomState(3)
    n = 4000
    x = rng.randint(1, 100, size=n)
    noise = rng.randint(-50, 51, size=n)
    y = 7 * x + 100 + noise
    h = rng.randint(0, 1 << 30, size=n)   # the fold hash
    df = spark.createDataFrame(
        [("g", int(x[i]), int(y[i]), int(h[i])) for i in range(n)],
        "grp string, x long, y long, h long")
    got = split_conformal_ols(df, "grp", "x", "y", "h",
                              alpha=0.1).collect()[0]

    assert abs(got["slope"] - 7) < 0.1
    assert abs(got["intercept"] - 100) < 5
    assert got["n_train"] + got["n_cal"] + got["n_test"] == n

    # hand-compute q̂ from the same folds and fit
    fold = h % 4
    tx, ty = x[fold <= 1], y[fold <= 1]
    nn = len(tx)
    sx, sy = float(tx.sum()), float(ty.sum())
    sxy, sxx = float((tx * ty).sum()), float((tx * tx).sum())
    b1 = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    b0 = (sy - b1 * sx) / nn
    r = np.abs(y[fold == 2] - (b0 + b1 * x[fold == 2]))
    k = int(np.ceil((len(r) + 1) * 0.9))
    qhat = np.sort(r)[k - 1]
    assert got["qhat"] == qhat
    assert got["n_cal"] == len(r)

    # conformal guarantee: coverage within sampling noise of 0.9
    assert 0.85 <= got["coverage"] <= 0.96

    # degenerate group (constant x): NULL fit, NULL q̂/coverage
    const = spark.createDataFrame(
        [("c", 5, i, i) for i in range(40)],
        "grp string, x long, y long, h long")
    g = split_conformal_ols(const, "grp", "x", "y", "h").collect()[0]
    assert g["slope"] is None and g["qhat"] is None
    assert g["coverage"] is None
