"""Binary-classifier evaluation — AUC, log-loss, Brier, calibration.

The model-quality readouts every scoring pipeline computes on held-out
data, expressed as pure relational algebra so they run distributed and
are oracle-checkable (unlike BinaryClassificationEvaluator's RDD
internals):

* ROC-AUC via the rank-sum identity AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋)
  (equivalently the Mann-Whitney U statistic normalized — the same
  average-rank window machinery as ``relational.mann_whitney_u``, with
  ties handled by average ranks = the trapezoidal ROC convention).
* Log-loss and Brier score as single conditional aggregates.
* A reliability (calibration) table over equal-width probability bins.

Float discipline: ranks and bin ids are exact integer/half-integer
arithmetic (no libm), so AUC and every calibration count are exactly
reproducible across engines; log-loss touches ln() — metrics are
therefore exposed micro-rounded (×1e6) where the cross-engine
disagreement (~1e-11 absolute over 1e5-row sums) sits far inside the
rounding grid.

At 100 TB: AUC is one partition-sort window over (score) — a single
global sort of scores; for monster eval sets, bucket scores first and
rank the bucket-aggregated table (the same distinct-value trick as
``relational.exact_percentiles``). Everything else is one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def binary_auc(df: DataFrame, label_col: str,
               score_col: str) -> DataFrame:
    """ROC-AUC from average ranks — one window + one aggregate.
    Returns 1 row (n_pos, n_neg, auc); NULL auc if either class is
    absent. ``label_col`` must be 0/1 (int)."""
    d = df.filter(F.col(score_col).isNotNull()
                  & F.col(label_col).isNotNull())
    wr = W.orderBy(score_col)
    wt = W.partitionBy(score_col)
    avg_rank = (F.rank().over(wr)
                + (F.count(F.lit(1)).over(wt) - F.lit(1)) / F.lit(2.0))
    ranked = d.select(F.col(label_col).alias("__y"),
                      avg_rank.alias("__r"))
    g = ranked.agg(
        F.count(F.when(F.col("__y") == 1, 1)).alias("n_pos"),
        F.count(F.when(F.col("__y") == 0, 1)).alias("n_neg"),
        F.sum(F.when(F.col("__y") == 1, F.col("__r"))).alias("__rp"))
    np_, nn = F.col("n_pos"), F.col("n_neg")
    auc = F.when((np_ > 0) & (nn > 0),
                 (F.col("__rp") - np_ * (np_ + 1) / F.lit(2.0))
                 / (np_.cast("double") * nn))
    return g.select("n_pos", "n_neg", auc.alias("auc"))


def binary_metrics(df: DataFrame, label_col: str,
                   prob_col: str) -> DataFrame:
    """Log-loss and Brier score in ONE aggregate. ``prob_col`` must
    already be clamped away from {0, 1} by the caller (the standard
    eps-clip) — ln(0) would poison the mean. Returns 1 row
    (n, n_pos, log_loss, brier)."""
    y = F.col(label_col).cast("double")
    p = F.col(prob_col)
    ll = -(y * F.log(p) + (1 - y) * F.log(1 - p))
    return (df.filter(p.isNotNull() & F.col(label_col).isNotNull())
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col(label_col)).cast("long").alias("n_pos"),
                 F.avg(ll).alias("log_loss"),
                 F.avg((p - y) * (p - y)).alias("brier")))


def calibration_bins(df: DataFrame, label_col: str, prob_col: str,
                     n_bins: int = 10) -> DataFrame:
    """Reliability table: equal-width probability bins →
    (bin, n, n_pos, mean_prob, frac_pos). A well-calibrated scorer
    has mean_prob ≈ frac_pos per bin. Bin ids are pure IEEE
    floor(p·n_bins) arithmetic (no libm), so bin assignment is
    bit-identical across engines on identical input doubles."""
    b = F.least(F.floor(F.col(prob_col) * n_bins).cast("long"),
                F.lit(n_bins - 1))
    return (df.filter(F.col(prob_col).isNotNull()
                      & F.col(label_col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col(label_col)).cast("long").alias("n_pos"),
                 F.avg(prob_col).alias("mean_prob"),
                 F.avg(F.col(label_col).cast("double"))
                 .alias("frac_pos")))
