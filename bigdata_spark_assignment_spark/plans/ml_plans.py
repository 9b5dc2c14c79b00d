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
    RandomForestRegressor,
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
    "q43_model_metrics_suite",
    oracle=None,  # ML training: rows-only (SURVEY.md §5.2)
    tags=("ml", "regression", "cv"),
)
def model_metrics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full model loop as one driver-visible summary
    (mirrors the final printed table, ``Main.scala:641-665``; merged r1
    q43+q45 plus the previously-unregistered RandomForest, M12
    ``Main.scala:577-580``):

    - LinearRegression at the reference's grid point (regParam .01,
      elasticNet .25, maxIter 10; M10, ``Main.scala:441-452``),
    - DecisionTreeRegressor under 3-fold CV with a depth grid
      (M11+M14, ``Main.scala:513-538``),
    - RandomForestRegressor with reference defaults (M12),

    each on a 70/30 split (seed 10), RMSE + R² on the held-out split
    (M13). One row per model; golden-range bands are the pytest
    contract (tests/test_flight_pipeline.py)."""
    # estimator fits run dozens of tiny aggregate jobs; under a
    # default-200-partition driver session that is pure task overhead —
    # scope the conf down for the fits, restore after
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        return _model_metrics(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _model_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _lineitem_features(spark, sf_dir).cache()
    train, test = df.randomSplit([0.7, 0.3], seed=SEED)

    def _metrics(model, name: str, best_depth: int | None):
        pred = model.transform(test)
        rmse = RegressionEvaluator(metricName="rmse").evaluate(pred)
        r2 = RegressionEvaluator(metricName="r2").evaluate(pred)
        return (name, best_depth, float(round(rmse, 2)), float(round(r2, 3)))

    lr = LinearRegression(regParam=0.01, elasticNetParam=0.25, maxIter=10)
    rows = [_metrics(lr.fit(train), "lr", None)]

    dtr = DecisionTreeRegressor(seed=SEED)
    grid = ParamGridBuilder().addGrid(dtr.maxDepth, [3, 5]).build()
    cv = CrossValidator(estimator=dtr, estimatorParamMaps=grid,
                        evaluator=RegressionEvaluator(metricName="rmse"),
                        numFolds=3, parallelism=4, seed=SEED)
    cv_model = cv.fit(train)
    rows.append(_metrics(cv_model, "dtr",
                         int(cv_model.bestModel.getMaxDepth())))

    rf = RandomForestRegressor(seed=SEED)
    rows.append(_metrics(rf.fit(train), "rf", None))
    df.unpersist()
    return spark.createDataFrame(
        rows, "model string, best_depth int, rmse double, r2 double")


@register(
    "q44_feature_pipeline_shape",
    oracle=None,  # vector columns: rows-only
    tags=("ml", "features", "selector"),
)
def feature_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3-M9 (``Main.scala:336-376,400-417``): StringIndexer →
    OneHotEncoder → VectorAssembler → L1 Normalizer over customer,
    plus BOTH UnivariateFeatureSelector modes (fdr and fwe, threshold
    0.05, F-regression against c_acctbal-derived label) — the
    reference's headline finding is FDR ≈ FWE, so the selected-feature
    counts are surfaced side by side. Returns the shape contract (row
    count, assembled width, L1 norm == 1, per-mode selected counts)."""
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
    l1 = float(round(sum(abs(v) for v in first.toArray()), 6))
    n_selected = {}
    for mode in ("fdr", "fwe"):
        sel = UnivariateFeatureSelector(
            featuresCol="normFeatures", outputCol=f"sel_{mode}",
            labelCol="label", selectionMode=mode)
        sel.setSelectionThreshold(0.05)
        sel.setFeatureType("continuous").setLabelType("continuous")
        n_selected[mode] = len(sel.fit(out).selectedFeatures)
    return spark.createDataFrame(
        [(out.count(), first.size, l1,
          n_selected["fdr"], n_selected["fwe"])],
        "n_rows long, feature_dim int, first_l1_norm double,"
        " n_selected_fdr int, n_selected_fwe int")


