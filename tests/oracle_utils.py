"""Local replica of the driver's DuckDB-oracle comparison.

Runs an engine query and its oracle SQL side-by-side and compares
row count, sorted column names, and order-insensitive values — the
same three checks CORRECTNESS_r{N}.json records, so a green run here
predicts a green driver run.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from bigdata_spark_assignment_spark.io import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries already round floats; this guards residual ulp noise.
        # repr-of-rounded, NOT the float itself: the driver's value
        # hash serializes the float, so -0.0 and +0.0 must compare
        # UNEQUAL here exactly as they hash apart there (the r6-r8 q07
        # class — Python round() preserves the sign of zero, and repr
        # keeps "-0.0" vs "0.0" distinct where tuple == would not).
        return repr(round(v, 6))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    return v


def normalize(rows, cols):
    """Sort columns by name (the driver does), normalize values,
    sort rows — order-insensitive multiset comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(row[i]) for i in order) for row in rows]
    out.sort(key=repr)
    return out


def compare_query_to_oracle(spark, sf_dir: str, fn, sql: str):
    """Returns (ok, message)."""
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    try:
        res = con.execute(sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = normalize(spark_rows, spark_cols)
    b = normalize(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
