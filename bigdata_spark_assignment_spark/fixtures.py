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

import random

from pyspark.sql import DataFrame, SparkSession
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
