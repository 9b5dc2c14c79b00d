"""Binary-classifier evaluation operators (operators/ml_eval.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.ml_eval import (
    binary_auc,
    binary_metrics,
    calibration_bins,
)


def _auc_ref(y, p):
    """Average-rank (trapezoidal-tie) AUC reference in numpy."""
    y, p = np.asarray(y), np.asarray(p)
    order = np.argsort(p, kind="stable")
    ranks = np.empty(len(p), dtype=float)
    sp = p[order]
    i = 0
    r = 1
    while i < len(sp):
        j = i
        while j < len(sp) and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = (r + (r + j - i - 1)) / 2.0
        r += j - i
        i = j
    np_, nn = y.sum(), (1 - y).sum()
    return (ranks[y == 1].sum() - np_ * (np_ + 1) / 2.0) / (np_ * nn)


def test_binary_auc_hand_ties_and_degenerate(spark):
    """Perfect separation → 1.0; ties use average ranks; one-class
    input yields NULL."""
    df = spark.createDataFrame(
        [(0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)], ["y", "p"])
    assert binary_auc(df, "y", "p").first().auc == pytest.approx(1.0)

    rows = [(0, 0.3), (1, 0.3), (0, 0.1), (1, 0.9)]
    got = binary_auc(spark.createDataFrame(rows, ["y", "p"]),
                     "y", "p").first()
    assert got.auc == pytest.approx(
        _auc_ref([r[0] for r in rows], [r[1] for r in rows]))

    one = spark.createDataFrame([(1, 0.5), (1, 0.7)], ["y", "p"])
    assert binary_auc(one, "y", "p").first().auc is None


def test_binary_auc_numpy_parity_random(spark):
    rng = np.random.default_rng(5)
    y = (rng.uniform(size=500) < 0.4).astype(int)
    p = np.round(rng.uniform(size=500) * 0.5 + y * 0.3, 2)  # ties
    df = spark.createDataFrame(
        [(int(a), float(b)) for a, b in zip(y, p)], ["y", "p"])
    got = binary_auc(df, "y", "p").first()
    assert (got.n_pos, got.n_neg) == (int(y.sum()), int((1 - y).sum()))
    assert got.auc == pytest.approx(_auc_ref(y, p))


def test_binary_metrics_and_calibration_hand(spark):
    rows = [(1, 0.9), (0, 0.1), (1, 0.6), (0, 0.4)]
    df = spark.createDataFrame(rows, ["y", "p"])
    m = binary_metrics(df, "y", "p").first()
    ll_ref = -np.mean([math.log(0.9), math.log(0.9),
                       math.log(0.6), math.log(0.6)])
    br_ref = np.mean([0.01, 0.01, 0.16, 0.16])
    assert m.n == 4 and m.n_pos == 2
    assert m.log_loss == pytest.approx(ll_ref)
    assert m.brier == pytest.approx(br_ref)

    cal = {r.bin: r for r in
           calibration_bins(df, "y", "p", n_bins=2).collect()}
    lo, hi = cal[0], cal[1]
    assert (lo.n, lo.n_pos) == (2, 0)
    assert (hi.n, hi.n_pos) == (2, 2)
    assert lo.frac_pos == pytest.approx(0.0)
    assert hi.mean_prob == pytest.approx(0.75)
    # p = 1.0 would fall past the last bin without the clamp
    edge = spark.createDataFrame([(1, 1.0)], ["y", "p"])
    assert calibration_bins(edge, "y", "p", 10).first().bin == 9
