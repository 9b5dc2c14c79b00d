"""M4 golden-range tests (SURVEY.md §5.2): the E1 pipeline on the
reference-shaped synthetic fixture must recover the planted linear
signal (ArrDelay ≈ DepDelay + 0.05·TaxiOut + N(0,8)).

Reference-published values (real year-2000 data, SURVEY.md §6) are
data-dependent; the portable assertions are metric RANGES, never
hashes (ML training is seed-sensitive — §7 hard part 1).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.fixtures import (
    FORBIDDEN_COLUMNS,
    make_flights,
    make_planes,
)
from bigdata_spark_assignment_spark.ml.flight_delay import (
    FlightDelayPipeline,
    clean_flights,
    featurize,
)


@pytest.fixture(scope="module")
def fixture_tables(spark):
    flights = make_flights(spark, n=4000).cache()
    planes = make_planes(spark, n=800).cache()
    yield flights, planes
    flights.unpersist()
    planes.unpersist()


def test_clean_flights_contract(spark, fixture_tables):
    flights, planes = fixture_tables
    df = clean_flights(flights, planes).cache()
    cols = set(df.columns)
    # leakage + post-outcome columns are gone
    assert not cols & set(FORBIDDEN_COLUMNS)
    assert not cols & {"Cancelled", "CancellationCode", "FlightNum", "TailNum"}
    # label is a non-null int; derived columns exist
    assert dict(df.dtypes)["ArrDelay"] == "int"
    assert df.filter(F.col("ArrDelay").isNull()).count() == 0
    assert {"PlaneAge", "DepTimeDayPart", "CRSArrTimeDayPart"} <= cols
    # PlaneAge clamped at 0, never negative (Main.scala:285 semantics)
    assert df.filter(F.col("PlaneAge") < 0).count() == 0
    # day-part buckets only contain the 8 labels (dirty hhmm filtered)
    parts = {r[0] for r in df.select("DepTimeDayPart").distinct().collect()}
    assert parts <= {"lateNight", "earlyMorning", "lateMorning",
                     "earlyAfternoon", "lateAfternoon", "earlyEvening",
                     "lateEvening", "earlyNight"}
    # imputation left no nulls in feature numerics
    for c in ("DepDelay", "TaxiOut", "Distance"):
        assert df.filter(F.col(c).isNull()).count() == 0
    assert df.count() > 2000  # most clean rows survive
    df.unpersist()


def test_featurize_produces_norm_vectors(spark, fixture_tables):
    flights, planes = fixture_tables
    df = featurize(clean_flights(flights, planes))
    row = df.select("features", "normFeatures").first()
    assert row.features.size == row.normFeatures.size
    # L1 normalization: component sum ≈ 1 (Normalizer p=1.0, M6)
    assert abs(sum(abs(v) for v in row.normFeatures.toArray()) - 1.0) < 1e-9


# r12: retrains an MLlib model per run; q43 surface frozen since r10 — slow set
@pytest.mark.slow
def test_linear_regression_recovers_signal(spark, fixture_tables):
    flights, planes = fixture_tables
    pipe = FlightDelayPipeline(selector_mode="fdr", cv_folds=3)
    prepared = pipe.prepare(flights, planes).cache()
    metrics = pipe.fit_evaluate(prepared, models=("lr",))
    prepared.unpersist()
    # planted noise σ=8 over DepDelay σ≈25 ⇒ R² ≈ 1 - 64/689 ≈ 0.9;
    # generous band for fixture size + OHE noise features
    assert metrics["lr"]["r2"] > 0.6, metrics
    assert metrics["lr"]["rmse"] < 16, metrics


# r12: retrains two tree models per run; frozen surface — slow set
@pytest.mark.slow
def test_tree_models_run_and_beat_constant_baseline(spark, fixture_tables):
    flights, planes = fixture_tables
    pipe = FlightDelayPipeline(selector_mode=None, cv_folds=2)
    prepared = pipe.prepare(flights, planes).cache()
    metrics = pipe.fit_evaluate(prepared, models=("dtr", "rf"))
    prepared.unpersist()
    for name in ("dtr", "rf"):
        assert metrics[name]["r2"] > 0.0, metrics
        assert metrics[name]["rmse"] > 0.0


def test_fdr_fwe_selector_equivalence(spark, fixture_tables):
    """M8/M9 + the reference's headline finding (Report §8 / SURVEY §6):
    FDR and FWE at threshold 0.05 select essentially the same features.
    FWE (family-wise, Bonferroni-shaped) can never be MORE permissive
    than FDR (Benjamini-Hochberg)."""
    from pyspark.ml.feature import UnivariateFeatureSelector

    from bigdata_spark_assignment_spark.ml.flight_delay import LABEL

    flights, planes = fixture_tables
    df = featurize(clean_flights(flights, planes)) \
        .withColumn(LABEL, F.col(LABEL).cast("double")).cache()
    selected = {}
    for mode in ("fdr", "fwe"):
        sel = UnivariateFeatureSelector(
            featuresCol="normFeatures", outputCol="sel",
            labelCol=LABEL, selectionMode=mode)
        sel.setFeatureType("continuous").setLabelType("continuous")
        sel.setSelectionThreshold(0.05)
        selected[mode] = set(sel.fit(df).selectedFeatures)
    df.unpersist()
    assert selected["fdr"] and selected["fwe"]
    assert selected["fwe"] <= selected["fdr"]
    # "no measurable difference" band: FWE keeps ≥ 60% of FDR's picks
    assert len(selected["fwe"]) >= 0.6 * len(selected["fdr"]), (
        {m: len(s) for m, s in selected.items()})


# r12: retrains an RF per run; frozen surface — slow set
@pytest.mark.slow
def test_rf_golden_range_on_planted_signal(spark, fixture_tables):
    """M12 golden range (reference publishes RF RMSE 19.17 / R² 0.726
    on real data, SURVEY §6): on the fixture's planted signal RF must
    land materially above the constant baseline — band, not hash."""
    flights, planes = fixture_tables
    pipe = FlightDelayPipeline(selector_mode="fdr", cv_folds=2)
    prepared = pipe.prepare(flights, planes).cache()
    metrics = pipe.fit_evaluate(prepared, models=("rf",))
    prepared.unpersist()
    assert metrics["rf"]["r2"] > 0.3, metrics
    assert metrics["rf"]["rmse"] < 25, metrics


def test_cli_lifecycle_end_to_end(spark):
    """E1 parity (Main.scala:41-76): ONE command replays the whole
    lifecycle — load → clean → featurize → select → CV → metrics."""
    from bigdata_spark_assignment_spark.cli import main

    metrics = main(["--fixture", "--fixture-rows", "2500",
                    "--models", "lr", "--cv-folds", "2"])
    assert "lr" in metrics
    assert metrics["lr"]["r2"] > 0.5


@pytest.mark.slow
def test_expo_shaped_metrics_discriminate_models(spark):
    """NON-planted golden ranges (r5, VERDICT r4 #2): on the
    Data-Expo-SHAPED generator (hub skew, seasonal/time-of-day delay
    propagation, heavy-tailed DepDelay, dominantly-linear arrival
    leg — fixtures.make_flights_expo) the model ORDERING the reference
    found on the real year-2000 file must emerge: LinearRegression
    beats both default-depth tree models (Report §8: LR 12.75/0.89 vs
    DTR 16.81/0.79 and RF 19.17/0.726), because trees
    piecewise-constant-underfit the wide continuous DepDelay signal.
    tools/ml_parity.py runs the same protocol at 1M rows / 5 folds;
    BASELINE.md records that table."""
    from bigdata_spark_assignment_spark.fixtures import make_flights_expo

    flights = make_flights_expo(spark, n=60_000)
    planes = make_planes(spark, n=3000)
    pipe = FlightDelayPipeline(selector_mode="fdr", cv_folds=3)
    prepared = pipe.prepare(flights, planes).cache()
    metrics = pipe.fit_evaluate(prepared, models=("lr", "dtr", "rf"))
    prepared.unpersist()
    lr, dtr, rf = metrics["lr"], metrics["dtr"], metrics["rf"]
    # LR recovers the dominantly-linear signal
    assert 0.80 < lr["r2"] < 0.97, metrics
    assert lr["rmse"] < 14, metrics
    # trees learn real structure but underfit relative to LR — the
    # reference's discriminating finding, reproduced without planting
    for name in ("dtr", "rf"):
        assert 0.4 < metrics[name]["r2"] < lr["r2"] - 0.02, metrics
        assert metrics[name]["rmse"] > lr["rmse"] + 1.0, metrics
