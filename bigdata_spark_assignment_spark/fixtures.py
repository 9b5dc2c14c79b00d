"""Reference-shaped synthetic fixtures (FIXTURES.md §A).

Deterministic in-memory generators for the ``flights`` fact table and
``planes`` dimension table with the reference's dirt conventions baked
in: every column arrives as a **string** (the reference reads CSV with
no schema, ``Main.scala:59,86``), missing values are the literal
``"NA"``, categoricals carry ``"Unknow"``/``"None"``/empty tokens
(``Main.scala:13-25``), some hhmm values exceed 2400
(``Main.scala:303``), and some plane ``issue_date`` values post-date
the flight year (negative-age clamp path, ``Main.scala:285``).

The signal is constructed, not sampled: ``ArrDelay ≈ DepDelay +
0.05·TaxiOut + noise``, so a correctly-wired regression pipeline must
recover R² well above 0 — the golden-range test contract
(SURVEY.md §5.2).

Everything is seeded ``random.Random`` driver-side (fixture sizes are
thousands of rows); at real scale you'd generate with ``spark.range``
+ column expressions instead.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CARRIERS = ["WN", "AA", "DL", "UA", "US", "NW", "CO", "MQ", "OO", "XE",
            "AS", "B6", "OH", "EV", "F9", "YV", "9E", "FL", "HA", "AQ"]
AIRPORTS = [f"A{i:02d}" for i in range(100)]
MANUFACTURERS = ["BOEING", "AIRBUS", "EMBRAER", "BOMBARDIER", "MCDONNELL DOUGLAS",
                 "CESSNA", "CANADAIR", "SAAB", "ATR", "FOKKER"]
ENGINE_TYPES = ["Turbo-Fan", "Turbo-Jet", "Turbo-Prop", "Reciprocating", "Unknow"]
AIRCRAFT_TYPES = ["Fixed Wing Multi-Engine", "Fixed Wing Single-Engine", "Rotorcraft"]

FLIGHT_COLUMNS = [
    "Year", "Month", "DayofMonth", "DayOfWeek", "DepTime", "CRSDepTime",
    "ArrTime", "CRSArrTime", "UniqueCarrier", "FlightNum", "TailNum",
    "ActualElapsedTime", "CRSElapsedTime", "AirTime", "ArrDelay", "DepDelay",
    "Origin", "Dest", "Distance", "TaxiIn", "TaxiOut", "Cancelled",
    "CancellationCode", "Diverted", "CarrierDelay", "WeatherDelay",
    "NASDelay", "SecurityDelay", "LateAircraftDelay",
]

PLANE_COLUMNS = ["tailnum", "type", "manufacturer", "issue_date", "model",
                 "status", "aircraft_type", "engine_type", "year"]

# The 10 leakage columns the reference drops up front (Main.scala:96-97).
FORBIDDEN_COLUMNS = ["ArrTime", "ActualElapsedTime", "AirTime", "TaxiIn",
                     "Diverted", "CarrierDelay", "WeatherDelay", "NASDelay",
                     "SecurityDelay", "LateAircraftDelay"]


def _hhmm(rng: random.Random) -> int:
    return rng.randrange(0, 24) * 100 + rng.randrange(0, 60)


def make_planes(spark: SparkSession, n: int = 800, seed: int = 42) -> DataFrame:
    """Planes dimension: ~15% bare-tailnum rows (only the join key
    populated — the real plane-data.csv quirk the reference filters at
    ``Main.scala:162``), "Unknow"/None dirt in categoricals."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        tail = f"N{i:04d}X"
        if rng.random() < 0.15:  # bare row: only tailnum
            rows.append((tail, None, None, None, None, None, None, None, None))
            continue
        issue_year = rng.randrange(1956, 2010)
        issue = f"{rng.randrange(1, 13)}/{rng.randrange(1, 29)}/{issue_year}"
        if rng.random() < 0.05:
            issue = rng.choice(["None", "NA", None])
        rows.append((
            tail,
            rng.choice(["Corporation", "Individual", "Partnership", "None", ""]),
            rng.choice(MANUFACTURERS),
            issue,
            f"{rng.randrange(100, 999)}-{rng.randrange(1, 9)}H{rng.randrange(1, 9)}",
            rng.choice(["Valid", "Valid", "Valid", ""]),
            rng.choice(AIRCRAFT_TYPES),
            rng.choice(ENGINE_TYPES),
            str(rng.randrange(1956, 2010)),
        ))
    schema = T.StructType([T.StructField(c, T.StringType()) for c in PLANE_COLUMNS])
    return spark.createDataFrame(rows, schema)


def make_flights(spark: SparkSession, n: int = 4000, year: int = 2000,
                 n_tails: int = 800, seed: int = 42) -> DataFrame:
    """Flights fact table, all-string, with a planted linear signal:
    ``ArrDelay = DepDelay + 0.05*TaxiOut + N(0, 8)`` on clean rows."""
    rng = random.Random(seed + 1)
    rows = []
    for i in range(n):
        dep_delay = max(-30, int(rng.gauss(10, 25)))
        taxi_out = rng.randrange(1, 120)
        arr_delay = int(dep_delay + 0.05 * taxi_out + rng.gauss(0, 8))
        dep_time = _hhmm(rng)
        if rng.random() < 0.01:
            dep_time = rng.randrange(2401, 2600)  # dirty hhmm (Main.scala:303)
        crs_arr = _hhmm(rng)
        if rng.random() < 0.01:
            crs_arr = rng.randrange(2401, 2600)
        cancelled = 1 if rng.random() < 0.02 else 0
        row = {
            "Year": str(year),
            "Month": str(rng.randrange(1, 13)),
            "DayofMonth": str(rng.randrange(1, 29)),
            "DayOfWeek": str(rng.randrange(1, 8)),
            "DepTime": "NA" if rng.random() < 0.03 else str(dep_time),
            "CRSDepTime": str(_hhmm(rng)),
            "ArrTime": str(_hhmm(rng)),
            # NA dirt here pins the impute-then-filter ORDER: the mean
            # must fill these before the <=2400 range filter sees them
            "CRSArrTime": "NA" if rng.random() < 0.02 else str(crs_arr),
            "UniqueCarrier": rng.choice(CARRIERS),
            "FlightNum": str(rng.randrange(1, 9999)),
            "TailNum": f"N{rng.randrange(0, n_tails):04d}X",
            "ActualElapsedTime": str(rng.randrange(20, 700)),
            "CRSElapsedTime": str(rng.randrange(20, 700)),
            "AirTime": str(rng.randrange(15, 650)),
            "ArrDelay": "NA" if rng.random() < 0.05 else str(arr_delay),
            "DepDelay": "NA" if rng.random() < 0.02 else str(dep_delay),
            "Origin": rng.choice(AIRPORTS),
            "Dest": rng.choice(AIRPORTS),
            "Distance": str(rng.randrange(30, 5000)),
            "TaxiIn": str(rng.randrange(1, 60)),
            "TaxiOut": "NA" if rng.random() < 0.04 else str(taxi_out),
            "Cancelled": str(cancelled),
            "CancellationCode": rng.choice(["A", "B", "C", "D"]) if cancelled else "",
            "Diverted": "0",
            "CarrierDelay": "NA",
            "WeatherDelay": "NA",
            "NASDelay": "NA",
            "SecurityDelay": "NA",
            "LateAircraftDelay": "NA",
        }
        rows.append(tuple(row[c] for c in FLIGHT_COLUMNS))
    schema = T.StructType([T.StructField(c, T.StringType()) for c in FLIGHT_COLUMNS])
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Data-Expo-SHAPED generator at scale (r5, VERDICT r4 #2)
# ---------------------------------------------------------------------------

def _unif(k: int, seed: int) -> Column:
    """Deterministic uniform in [0,1) from (row id, stream k, seed) —
    one xxhash64, executor-side, no driver RNG loop."""
    return (F.pmod(F.xxhash64(F.col("id"), F.lit(k), F.lit(seed)),
                   F.lit(1 << 30)).cast("double") / float(1 << 30))


def _normal(k: int, seed: int) -> Column:
    """Box-Muller standard normal from two uniform streams."""
    u1, u2 = _unif(k, seed), _unif(k + 1000003, seed)
    return (F.sqrt(-2.0 * F.log(1.0 - u1))
            * F.cos(F.lit(2.0 * math.pi) * u2))


def make_flights_expo(spark: SparkSession, n: int = 1_000_000,
                      year: int = 2000, n_tails: int = 3000,
                      seed: int = 42) -> DataFrame:
    """Data-Expo-SHAPED flights at arbitrary scale: ``spark.range(n)``
    + column expressions (fully distributed — the driver-side
    ``make_flights`` loop stops at fixture sizes), with the delay
    structure of the real on-time data rather than a planted formula:

    * **hub skew**: ~45% of departures from 8 hub airports (and hubs
      add taxi-out congestion) — the Zipf-ish traffic shape that
      stresses OHE cardinality and groupBy skew exactly like the real
      Origin column;
    * **seasonal + time-of-day propagation**: Jun/Jul/Dec (+storms/
      holidays) and late-day departures carry higher delay means — the
      two strongest structural effects in the published Data Expo
      analyses;
    * **heavy-tailed departure delay**: on-time Gaussian core + a
      ~32% exponential late tail (mean ≈ 38 min), matching the
      long-right-tail histogram of the real ``DepDelay``;
    * **arrival leg**: ``ArrDelay = DepDelay + 0.35·(TaxiOut−12) −
      0.004·Distance + hub/season congestion + N(0,8)`` — dominantly
      LINEAR in observed features (which is why the reference's
      LinearRegression beat both trees on the real data, Report §8),
      with a mild nonlinear hub×season interaction so trees aren't
      artificially zeroed;
    * **reference dirt conventions**: all columns STRING, "NA" at
      real-data-like rates (label ~2%, DepDelay/TaxiOut 1-2%), dirty
      hhmm > 2400 rows, cancelled ~2%.

    Same schema/column order as ``make_flights``; feeds the same
    ``FlightDelayPipeline`` (clean → featurize → UFS → CV) without
    changes. tools/ml_parity.py runs the full reference protocol on it
    at 1M rows and BASELINE.md records the resulting metric table.
    """
    df = spark.range(n)

    month = (1 + F.floor(_unif(1, seed) * 12)).cast("int")
    dom = (1 + F.floor(_unif(2, seed) * 28)).cast("int")
    dow = (1 + F.floor(_unif(3, seed) * 7)).cast("int")
    hour = (5 + F.floor(_unif(4, seed) * 18)).cast("int")     # 5..22
    minute = F.floor(_unif(5, seed) * 60).cast("int")

    carrier_idx = F.floor(F.pow(_unif(6, seed), 1.5) * 20).cast("int")
    hub_origin = _unif(7, seed) < 0.45
    origin_idx = F.when(hub_origin, F.floor(_unif(8, seed) * 8)) \
        .otherwise(8 + F.floor(_unif(8, seed) * 92)).cast("int")
    hub_dest = _unif(9, seed) < 0.45
    dest_idx = F.when(hub_dest, F.floor(_unif(10, seed) * 8)) \
        .otherwise(8 + F.floor(_unif(10, seed) * 92)).cast("int")
    distance = (100 + F.floor(F.pow(_unif(11, seed), 1.5) * 2400)) \
        .cast("int")
    taxi_out = F.round(
        6.0 + 10.0 * -F.log(1.0 - _unif(12, seed))
        + F.when(hub_origin, 6.0).otherwise(0.0)).cast("int")

    seasonal = F.when(month.isin(6, 7, 12), 7.0) \
        .when(month == 1, 3.0).otherwise(0.0)
    hour_eff = 0.7 * (hour - 5).cast("double")
    carrier_eff = (F.pmod(carrier_idx, F.lit(7)) - 3).cast("double")
    late_tail = F.when(_unif(13, seed) < 0.32,
                       38.0 * -F.log(1.0 - _unif(14, seed))).otherwise(0.0)
    dep_delay = F.round(F.greatest(
        F.lit(-15.0),
        -4.0 + 4.0 * _normal(15, seed) + 0.5 * seasonal + hour_eff
        + carrier_eff + late_tail)).cast("int")

    congestion_arr = F.when(hub_dest & month.isin(6, 7, 12),
                            6.0 * _unif(16, seed)).otherwise(0.0)
    arr_delay = F.round(
        dep_delay.cast("double")
        + 0.35 * (taxi_out - 12).cast("double")
        - 0.004 * distance.cast("double")
        + congestion_arr
        + 8.0 * _normal(17, seed)).cast("int")

    # actual departure clock = scheduled + delay, wrapped to the day;
    # ~1% dirty > 2400 rows keep the reference's range-filter path hot
    sched_min = hour * 60 + minute
    dep_min = F.pmod(sched_min + dep_delay, F.lit(1440))
    dep_time = (F.floor(dep_min / 60) * 100 + F.pmod(dep_min, F.lit(60))) \
        .cast("int")
    dep_time = F.when(_unif(18, seed) < 0.01,
                      (2401 + F.floor(_unif(19, seed) * 199)).cast("int")) \
        .otherwise(dep_time)
    crs_arr_min = F.pmod(sched_min + F.round(distance / 7.0), F.lit(1440))
    crs_arr = (F.floor(crs_arr_min / 60) * 100
               + F.pmod(crs_arr_min, F.lit(60))).cast("int")

    cancelled = (_unif(20, seed)
                 < 0.015 + F.when(seasonal > 0, 0.01).otherwise(0.0)) \
        .cast("int")
    tail_idx = F.floor(F.pow(_unif(21, seed), 1.2) * n_tails).cast("int")

    def na(col: Column, k: int, rate: float) -> Column:
        return F.when(_unif(k, seed) < rate, "NA") \
            .otherwise(col.cast("string"))

    carriers = F.array(*[F.lit(c) for c in CARRIERS])
    out = df.select(
        F.lit(str(year)).alias("Year"),
        month.cast("string").alias("Month"),
        dom.cast("string").alias("DayofMonth"),
        dow.cast("string").alias("DayOfWeek"),
        na(dep_time, 22, 0.025).alias("DepTime"),
        (hour * 100 + minute).cast("string").alias("CRSDepTime"),
        crs_arr.cast("string").alias("ArrTime"),
        na(crs_arr, 23, 0.02).alias("CRSArrTime"),
        F.element_at(carriers, carrier_idx + 1).alias("UniqueCarrier"),
        (1 + F.pmod(F.col("id"), F.lit(9998))).cast("string")
         .alias("FlightNum"),
        F.format_string("N%04dX", tail_idx).alias("TailNum"),
        (distance / 8 + taxi_out + 30).cast("int").cast("string")
         .alias("ActualElapsedTime"),
        (distance / 8 + 35).cast("int").cast("string")
         .alias("CRSElapsedTime"),
        (distance / 8).cast("int").cast("string").alias("AirTime"),
        na(arr_delay, 24, 0.02).alias("ArrDelay"),
        na(dep_delay, 25, 0.018).alias("DepDelay"),
        F.format_string("A%02d", origin_idx).alias("Origin"),
        F.format_string("A%02d", dest_idx).alias("Dest"),
        distance.cast("string").alias("Distance"),
        (3 + F.floor(_unif(26, seed) * 12)).cast("int").cast("string")
         .alias("TaxiIn"),
        na(taxi_out, 27, 0.02).alias("TaxiOut"),
        cancelled.cast("string").alias("Cancelled"),
        F.when(cancelled == 1,
               F.element_at(F.array(F.lit("A"), F.lit("B"), F.lit("C"),
                                    F.lit("D")),
                            (1 + F.floor(_unif(28, seed) * 4)).cast("int")))
         .otherwise("").alias("CancellationCode"),
        F.lit("0").alias("Diverted"),
        F.lit("NA").alias("CarrierDelay"),
        F.lit("NA").alias("WeatherDelay"),
        F.lit("NA").alias("NASDelay"),
        F.lit("NA").alias("SecurityDelay"),
        F.lit("NA").alias("LateAircraftDelay"),
    )
    return out.select(*FLIGHT_COLUMNS)
