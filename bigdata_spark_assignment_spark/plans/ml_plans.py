"""ML-pipeline queries (SURVEY.md §2.7, M4) over the driver tables.

ML training is not ANSI-SQL-expressible, so these are rows-only driver
checks (oracle=None) — the strong-form parity lives in
tests/test_flight_pipeline.py (golden-range metrics on the
reference-shaped fixture). Everything here is seeded and deterministic
in shape: fixed row counts and stable column sets.

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
    LinearRegression,
)
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

SEED = 10


def _lineitem_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression task over driver data: predict l_extendedprice from
    quantity + part list price (in TPC-H, extendedprice ≈ qty·price —
    a real signal, so R² must come out ≫ 0 for a correctly wired
    pipeline)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    df = li.join(F.broadcast(part), li.l_partkey == part.p_partkey) \
           .select("l_quantity", "l_discount", "p_retailprice",
                   F.col("l_extendedprice").alias("label"))
    assembler = VectorAssembler(
        inputCols=["l_quantity", "l_discount", "p_retailprice"],
        outputCol="features")
    return assembler.transform(df)


@register(
    "q43_linear_regression_metrics",
    oracle=None,  # ML training: rows-only (SURVEY.md §5.2)
    tags=("ml", "regression"),
)
def lr_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10+M13 (``Main.scala:441-466``): LinearRegression with the
    reference's grid point (regParam .01, elasticNet .25, maxIter 10),
    70/30 split seed 10, RMSE + R² on the held-out split."""
    df = _lineitem_features(spark, sf_dir)
    train, test = df.randomSplit([0.7, 0.3], seed=SEED)
    lr = LinearRegression(regParam=0.01, elasticNetParam=0.25, maxIter=10)
    pred = lr.fit(train).transform(test)
    rmse = RegressionEvaluator(metricName="rmse").evaluate(pred)
    r2 = RegressionEvaluator(metricName="r2").evaluate(pred)
    return spark.createDataFrame(
        [("lr", float(round(rmse, 2)), float(round(r2, 3)))],
        "model string, rmse double, r2 double")


@register(
    "q44_feature_pipeline_shape",
    oracle=None,  # vector columns: rows-only
    tags=("ml", "features"),
)
def feature_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3-M7 (``Main.scala:336-376``): StringIndexer → OneHotEncoder →
    VectorAssembler → L1 Normalizer over customer; returns the shape
    contract (row count, assembled width, L1 norm == 1)."""
    cust = load_table(spark, sf_dir, "customer")
    pipe = Pipeline(stages=[
        StringIndexer(inputCol="c_mktsegment", outputCol="segIndexed",
                      handleInvalid="keep"),
        OneHotEncoder(inputCol="segIndexed", outputCol="segCat"),
        VectorAssembler(inputCols=["c_acctbal", "segCat"],
                        outputCol="features"),
        Normalizer(inputCol="features", outputCol="normFeatures", p=1.0),
    ])
    out = pipe.fit(cust).transform(cust)
    first = out.select("normFeatures").first()[0]
    l1 = float(round(sum(abs(v) for v in first.toArray()), 6))
    return spark.createDataFrame(
        [(out.count(), first.size, l1)],
        "n_rows long, feature_dim int, first_l1_norm double")


@register(
    "q45_cv_decision_tree",
    oracle=None,  # ML training: rows-only
    tags=("ml", "cv"),
)
def cv_dtr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11+M14 (``Main.scala:513-538``): DecisionTreeRegressor under
    3-fold CV (RMSE selector) with a small depth grid; returns the
    chosen depth + held-out metrics."""
    df = _lineitem_features(spark, sf_dir)
    train, test = df.randomSplit([0.7, 0.3], seed=SEED)
    dtr = DecisionTreeRegressor(seed=SEED)
    grid = ParamGridBuilder().addGrid(dtr.maxDepth, [3, 5]).build()
    cv = CrossValidator(estimator=dtr, estimatorParamMaps=grid,
                        evaluator=RegressionEvaluator(metricName="rmse"),
                        numFolds=3, parallelism=4, seed=SEED)
    model = cv.fit(train)
    best_depth = model.bestModel.getMaxDepth()
    pred = model.transform(test)
    rmse = RegressionEvaluator(metricName="rmse").evaluate(pred)
    r2 = RegressionEvaluator(metricName="r2").evaluate(pred)
    return spark.createDataFrame(
        [("dtr", int(best_depth), float(round(rmse, 2)), float(round(r2, 3)))],
        "model string, best_depth int, rmse double, r2 double")
