"""ML-pipeline queries (SURVEY.md §2.7, M4) over the driver tables.

ML training is not ANSI-SQL-expressible, so the driver contract hashes
what IS checkable (r3): feature-pipeline shape numbers the oracle
re-derives from the data (row counts, assembled width = distinct
categories + numeric inputs), the CV-chosen hyperparameter, and
metric-band booleans over a PLANTED deterministic signal — the label
is an exact function of the features plus bounded pseudo-noise, so a
correctly wired estimator MUST clear the bands and a miswired one
cannot. Exact golden-range metrics stay the pytest contract
(tests/test_flight_pipeline.py on the reference-shaped fixture).

The estimators themselves are ``pyspark.ml`` — per SURVEY.md §2.7 the
reference's ML surface maps 1:1 onto the library, so engine parity is
composition, not reimplementation.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import (
    Normalizer,
    OneHotEncoder,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.regression import (
    DecisionTreeRegressor,
    GBTRegressor,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

SEED = 10


def _lineitem_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression task over driver data with a PLANTED deterministic
    signal: label = 3·qty + 0.5·retailprice − 100·discount + bounded
    pseudo-noise from the order key (the driver's synthetic lineitem
    carries no real qty→price correlation, so without planting, every
    model scores R² ≈ 0 and the metric bands would verify nothing).
    The noise term is NOT in the feature set, so LR's irreducible rmse
    is the noise σ and the R² bands genuinely discriminate wired from
    miswired pipelines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    label = (3.0 * F.col("l_quantity")
             + 0.5 * F.col("p_retailprice")
             - 100.0 * F.col("l_discount")
             + (F.col("l_orderkey") % 97) / 97.0 * 50.0)
    df = li.join(F.broadcast(part), li.l_partkey == part.p_partkey) \
           .select("l_quantity", "l_discount", "p_retailprice",
                   label.alias("label"))
    assembler = VectorAssembler(
        inputCols=["l_quantity", "l_discount", "p_retailprice"],
        outputCol="features")
    return assembler.transform(df)


@register(
    "q43_ml_suite",
    oracle="""
    SELECT 'ml' AS part, 'lr' AS name, CAST(NULL AS BIGINT) AS ival, TRUE AS ok
    UNION ALL SELECT 'ml', 'dtr', 5, TRUE
    UNION ALL SELECT 'ml', 'rf', NULL, TRUE
    UNION ALL SELECT 'ml', 'gbt', NULL, TRUE
    UNION ALL SELECT 'feat', 'n_rows',
        (SELECT COUNT(*) FROM customer), TRUE
    UNION ALL SELECT 'feat', 'feature_dim',
        (SELECT COUNT(DISTINCT c_mktsegment) + 1 FROM customer), TRUE
    UNION ALL SELECT 'feat', 'l1_norm', NULL, TRUE
    UNION ALL SELECT 'feat', 'n_selected_fdr',
        (SELECT COUNT(DISTINCT c_mktsegment) + 1 FROM customer), TRUE
    UNION ALL SELECT 'feat', 'n_selected_fwe',
        (SELECT COUNT(DISTINCT c_mktsegment) + 1 FROM customer), TRUE
    UNION ALL
    -- r6: binary-eval suite (operators.ml_eval) — AUC via the exact
    -- rank-sum identity, log-loss/Brier micro-rounded (ln() ulps sit
    -- ~1e-11 below the 1e-6 grid), calibration counts exact (bin =
    -- pure IEEE floor arithmetic, no libm)
    SELECT 'eval', e.name, e.ival, TRUE
    FROM (
      WITH sc AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               LEAST(GREATEST(o_totalprice / 600000.0, 0.001), 0.999)
                 AS p
        FROM orders),
      r AS (
        SELECT y, RANK() OVER (ORDER BY p)
                 + (COUNT(*) OVER (PARTITION BY p) - 1) / 2.0 AS rk
        FROM sc),
      a AS (
        SELECT SUM(rk) FILTER (y = 1) AS rp,
               CAST(COUNT(*) FILTER (y = 1) AS DOUBLE) AS np,
               CAST(COUNT(*) FILTER (y = 0) AS DOUBLE) AS nn
        FROM r),
      cal AS (
        SELECT LEAST(CAST(floor(p * 10) AS BIGINT), 9) AS b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos
        FROM sc GROUP BY 1)
      SELECT 'auc_ppm' AS name,
             CAST(ROUND((rp - np * (np + 1) / 2.0) / (np * nn) * 1e6)
                  AS BIGINT) AS ival
      FROM a
      UNION ALL
      SELECT 'logloss_micro',
             CAST(ROUND(AVG(-(y * ln(p) + (1 - y) * ln(1 - p))) * 1e6)
                  AS BIGINT)
      FROM sc
      UNION ALL
      SELECT 'brier_micro',
             CAST(ROUND(AVG((p - y) * (p - y)) * 1e6) AS BIGINT)
      FROM sc
      UNION ALL
      SELECT 'calib:' || CAST(b AS VARCHAR) || ':n', n FROM cal
      UNION ALL
      SELECT 'calib:' || CAST(b AS VARCHAR) || ':pos', n_pos
      FROM cal) e
    """,
    tags=("ml", "regression", "cv", "features", "selector", "eval"),
)
def ml_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full ML surface as ONE oracle-backed driver row
    set (merged r2 q43+q44; reference ``Main.scala:336-417,441-665``):

    ``ml`` rows — the model loop (mirrors the final printed table,
    ``Main.scala:641-665``): LinearRegression at the reference's grid
    point (regParam .01, elasticNet .25, maxIter 10; M10), a
    DecisionTreeRegressor under 3-fold CV with a depth grid (M11+M14,
    seed 10), a GBTRegressor (r7 — the boosting sibling the
    reference's model table omits; 10 rounds, band R² ≥ 0.7 /
    rmse ≤ 40), and a RandomForestRegressor with reference defaults
    (M12), each on a 70/30 split (seed 10) scored with
    RegressionEvaluator RMSE + R² (M13) on the held-out split. Hashed
    as band booleans over the planted signal (lr R² ≥ 0.8, dtr ≥ 0.7,
    rf ≥ 0.6, all rmse ≤ 40 ≈ 2.8σ of the planted noise — measured
    0.91/0.89/0.79 and 14-22) plus the CV-chosen depth as a hard
    integer (the planted signal makes depth 5 strictly better than 3).

    ``feat`` rows — M3-M9: StringIndexer → OneHotEncoder →
    VectorAssembler → L1 Normalizer over customer, plus BOTH
    UnivariateFeatureSelector modes (fdr and fwe, threshold 0.05,
    F-regression against a c_acctbal-derived label). ``n_rows`` and
    ``feature_dim`` are genuinely SQL-derived (width = distinct
    segments + the numeric input; keep-invalid bucket minus OHE
    dropLast cancel); the reference's headline finding — FDR ≈ FWE —
    is pinned by both selector counts hashing to the same SQL-derived
    feature count (the L1-coupled features all pass at α=0.05).

    ``eval`` rows — r6 (operators.ml_eval): the binary-classifier
    readouts the reference's regression-only evaluator lacks, over a
    deterministic (label = status F, p = clamped scaled totalprice)
    scoring: ROC-AUC in ppm via the exact rank-sum identity (average
    ranks = trapezoidal tie handling — exact across engines),
    micro-rounded log-loss and Brier score, and the 10-bin
    reliability table's per-bin n / n_pos counts (bin ids are pure
    IEEE floor arithmetic). Every value is fully re-derived by the
    oracle — no pinning."""
    # estimator fits run dozens of tiny aggregate jobs; under a
    # default-200-partition driver session that is pure task overhead —
    # scope the conf down for the fits, restore after
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        rows = _ml_rows(spark, sf_dir) + _feat_rows(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    fixed = spark.createDataFrame(
        rows, "part string, name string, ival long, ok boolean")
    return fixed.unionByName(_eval_df(spark, sf_dir))


def _eval_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q43 ``eval`` legs as a LAZY DataFrame (no driver-side
    materialization): AUC / log-loss / Brier / calibration over the
    deterministic orders scoring."""
    from ..operators.ml_eval import (
        binary_auc,
        binary_metrics,
        calibration_bins,
    )

    orders = load_table(spark, sf_dir, "orders")
    sc = orders.select(
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        F.least(F.greatest(F.col("o_totalprice") / F.lit(600000.0),
                           F.lit(0.001)), F.lit(0.999)).alias("p"))
    part = F.lit("eval").alias("part")
    auc = (binary_auc(sc, "y", "p")
           .select(part, F.lit("auc_ppm").alias("name"),
                   F.round(F.col("auc") * 1e6).cast("long")
                   .alias("ival"),
                   ((F.col("auc") > 0.0) & (F.col("auc") < 1.0))
                   .alias("ok")))
    met = binary_metrics(sc, "y", "p")
    ll = met.select(part, F.lit("logloss_micro").alias("name"),
                    F.round(F.col("log_loss") * 1e6).cast("long")
                    .alias("ival"),
                    (F.col("log_loss") > 0.0).alias("ok"))
    br = met.select(part, F.lit("brier_micro").alias("name"),
                    F.round(F.col("brier") * 1e6).cast("long")
                    .alias("ival"),
                    ((F.col("brier") >= 0.0) & (F.col("brier") <= 1.0))
                    .alias("ok"))
    cal = calibration_bins(sc, "y", "p", n_bins=10)
    cal_name = lambda suffix: F.concat(  # noqa: E731
        F.lit("calib:"), F.col("bin").cast("string"), F.lit(suffix))
    caln = cal.select(part, cal_name(":n").alias("name"),
                      F.col("n").alias("ival"),
                      (F.col("n") > 0).alias("ok"))
    calp = cal.select(part, cal_name(":pos").alias("name"),
                      F.col("n_pos").alias("ival"),
                      ((F.col("frac_pos") >= 0.0)
                       & (F.col("frac_pos") <= 1.0)).alias("ok"))
    return (auc.unionByName(ll).unionByName(br)
            .unionByName(caln).unionByName(calp))


def _ml_rows(spark: SparkSession, sf_dir: str) -> list[tuple]:
    df = _lineitem_features(spark, sf_dir).cache()
    train, test = df.randomSplit([0.7, 0.3], seed=SEED)

    def _metrics(model) -> tuple[float, float]:
        pred = model.transform(test)
        rmse = RegressionEvaluator(metricName="rmse").evaluate(pred)
        r2 = RegressionEvaluator(metricName="r2").evaluate(pred)
        return rmse, r2

    lr_rmse, lr_r2 = _metrics(
        LinearRegression(regParam=0.01, elasticNetParam=0.25,
                         maxIter=10).fit(train))

    dtr = DecisionTreeRegressor(seed=SEED)
    grid = ParamGridBuilder().addGrid(dtr.maxDepth, [3, 5]).build()
    cv = CrossValidator(estimator=dtr, estimatorParamMaps=grid,
                        evaluator=RegressionEvaluator(metricName="rmse"),
                        numFolds=3, parallelism=4, seed=SEED)
    cv_model = cv.fit(train)
    dtr_rmse, dtr_r2 = _metrics(cv_model)
    best_depth = int(cv_model.bestModel.getMaxDepth())

    rf_rmse, rf_r2 = _metrics(RandomForestRegressor(seed=SEED).fit(train))
    # r7 session 3: gradient-boosted trees (M12's ensemble sibling;
    # pyspark.ml per SURVEY.md §2.7). 10 boosting rounds keep the fit
    # cheap; on the planted signal boosting must beat the single tree's
    # band floor comfortably
    gbt_rmse, gbt_r2 = _metrics(
        GBTRegressor(seed=SEED, maxIter=10).fit(train))
    df.unpersist()
    return [
        ("ml", "lr", None, bool(lr_r2 >= 0.8 and lr_rmse <= 40.0)),
        ("ml", "dtr", best_depth,
         bool(dtr_r2 >= 0.7 and dtr_rmse <= 40.0)),
        ("ml", "rf", None, bool(rf_r2 >= 0.6 and rf_rmse <= 40.0)),
        ("ml", "gbt", None, bool(gbt_r2 >= 0.7 and gbt_rmse <= 40.0)),
    ]


def _feat_rows(spark: SparkSession, sf_dir: str) -> list[tuple]:
    from pyspark.ml.feature import UnivariateFeatureSelector

    cust = load_table(spark, sf_dir, "customer")
    pipe = Pipeline(stages=[
        StringIndexer(inputCol="c_mktsegment", outputCol="segIndexed",
                      handleInvalid="keep"),
        OneHotEncoder(inputCol="segIndexed", outputCol="segCat"),
        VectorAssembler(inputCols=["c_acctbal", "segCat"],
                        outputCol="features"),
        Normalizer(inputCol="features", outputCol="normFeatures", p=1.0),
    ])
    out = pipe.fit(cust).transform(cust) \
        .withColumn("label", (F.col("c_acctbal") * 2.0
                              + F.col("c_custkey") % 7).cast("double"))
    first = out.select("normFeatures").first()[0]
    l1 = float(sum(abs(v) for v in first.toArray()))
    n_selected = {}
    for mode in ("fdr", "fwe"):
        sel = UnivariateFeatureSelector(
            featuresCol="normFeatures", outputCol=f"sel_{mode}",
            labelCol="label", selectionMode=mode)
        sel.setSelectionThreshold(0.05)
        sel.setFeatureType("continuous").setLabelType("continuous")
        n_selected[mode] = len(sel.fit(out).selectedFeatures)
    return [
        ("feat", "n_rows", out.count(), True),
        ("feat", "feature_dim", int(first.size), True),
        ("feat", "l1_norm", None, bool(abs(l1 - 1.0) < 1e-6)),
        ("feat", "n_selected_fdr", n_selected["fdr"], True),
        ("feat", "n_selected_fwe", n_selected["fwe"], True),
    ]
