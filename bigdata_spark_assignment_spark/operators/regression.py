"""Grouped regression operators that need per-group iterative fits —
the ``applyInPandas`` grouped-ML pattern (each group ships through
Arrow to one task; thousands of fits run embarrassingly parallel).

Currently: isotonic regression (pool-adjacent-violators), the
monotone calibration step (Zadrozny/Elkan-style probability
calibration, dose-response curves) that no SQL window can express —
PAV's pooling is data-dependently iterative, so this operator is
pytest-verified against an independent pure-Python PAV rather than
oracle-checked (the BPE/pHash precedent).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["isotonic_fit"]

_ISO_SCHEMA = T.StructType([
    T.StructField("group", T.StringType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("y_iso", T.DoubleType()),
])


def _pav(y, w):
    """Weighted pool-adjacent-violators on a sequence already sorted
    by x: returns the non-decreasing fit minimizing Σw(y−ŷ)².
    Stack-based linear-time merge."""
    blocks: list[list[float]] = []  # [mean, weight]
    counts: list[int] = []
    for yi, wi in zip(y, w):
        blocks.append([float(yi), float(wi)])
        counts.append(1)
        while len(blocks) > 1 and blocks[-2][0] >= blocks[-1][0]:
            m2, w2 = blocks.pop()
            c2 = counts.pop()
            m1, w1 = blocks[-1]
            blocks[-1] = [(m1 * w1 + m2 * w2) / (w1 + w2), w1 + w2]
            counts[-1] += c2
    out: list[float] = []
    for (m, _), c in zip(blocks, counts):
        out.extend([m] * c)
    return out


def isotonic_fit(df: DataFrame, key_col: str, x_col: str,
                 y_col: str) -> DataFrame:
    """Per-key isotonic regression: fit the best non-decreasing step
    function ŷ(x) (least squares) and return (group, x, y, y_iso) for
    every input row.

    Tie handling matches the standard formulation: rows sharing an x
    are pre-pooled to their mean (weight = count) before PAV, so the
    fit is a FUNCTION of x and row order within ties cannot matter —
    which also makes the operator deterministic under Spark's
    unordered group delivery. NULL x/y rows are dropped.

    Plan: one shuffle on the key; each group sorts locally by x and
    runs the linear-time stack PAV — the grouped-ML shape (a giant
    single group serializes into one task; split such keys upstream
    or fall back to a global isotonic via the q10-style ordered
    sweep... which SQL cannot express either — documented bound).
    """
    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=["x", "y"]).sort_values("x")
        pooled = (pdf.groupby("x", sort=True)["y"]
                  .agg(["mean", "count"]).reset_index())
        fit = _pav(pooled["mean"].tolist(), pooled["count"].tolist())
        lut = dict(zip(pooled["x"], fit))
        return pd.DataFrame({
            "group": pdf["group"],
            "x": pdf["x"],
            "y": pdf["y"],
            "y_iso": [lut[x] for x in pdf["x"]],
        })

    flat = df.select(F.col(key_col).cast("string").alias("group"),
                     F.col(x_col).cast("double").alias("x"),
                     F.col(y_col).cast("double").alias("y"))
    return flat.groupBy("group").applyInPandas(_fit, _ISO_SCHEMA)
