"""Simulate the driver: import __spark_entry__ from outside the repo,
run entry() smoke, run each queries()[name] at sf0.01, compare against
oracle_sql() under DuckDB (row count + sorted columns + values).

Usage:
    python tests/driver_sim.py [name-substring ...]

With no args, runs the FULL suite in contract order and writes
SELFCHECK.json (CORRECTNESS-schema record for every registered query,
including the ones past the driver's 50-entry prefix) next to the repo
root. With args, runs only queries whose name contains any substring
(no SELFCHECK written).
"""
import importlib.util
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

filters = sys.argv[1:]

# t1 smoke
df = mod.entry(spark)
rows = df.collect()
print("SMOKE entry(): rows =", len(rows), "cols =", df.columns)

# t2 correctness
import datetime as dt  # noqa: E402
import math  # noqa: E402
import time  # noqa: E402

import duckdb  # noqa: E402

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(v):
    # Floats normalize to repr-of-rounded, NOT the float itself: the
    # driver's value hash serializes the float, and -0.0 hashes apart
    # from +0.0 even though Python's == (tuple compare) calls them
    # equal. round() preserves the sign of zero, so repr keeps the
    # distinction ("-0.0" vs "0.0") and this sim can catch the exact
    # class that stayed hidden through rounds 6-8 (q07 cmat).
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 6))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


qs, oracles = mod.queries(), mod.oracle_sql()
results: dict[str, str] = {}
record: dict[str, dict] = {}
# contract order (the driver consumes the dict in this order and checks
# a 50-entry prefix) — NOT sorted
for pos, (name, fn) in enumerate(qs.items()):
    if filters and not any(f in name for f in filters):
        continue
    t0 = time.time()
    entry = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        sdf = fn(spark, SF)
        scols = sorted(sdf.columns)
        srows = sorted(
            [tuple(norm(r[c]) for c in scols)
             for r in (row.asDict() for row in sdf.collect())], key=repr)
        entry["spark_rows"] = len(srows)
        if name not in oracles:
            entry["err"] = "no_oracle"
            results[name] = f"rows-only: {len(srows)} rows OK"
        else:
            res = con.execute(oracles[name])
            dcols_raw = [d[0] for d in res.description]
            dcols = sorted(dcols_raw)
            idx = [dcols_raw.index(c) for c in dcols]
            drows = sorted(
                [tuple(norm(r[i]) for i in idx) for r in res.fetchall()],
                key=repr)
            entry["oracle_rows"] = len(drows)
            entry["schema_match"] = scols == dcols
            entry["rows_match"] = len(srows) == len(drows)
            entry["hash_match"] = (entry["schema_match"]
                                   and srows == drows)
            if not entry["schema_match"]:
                results[name] = f"FAIL cols {scols} vs {dcols}"
            elif not entry["rows_match"]:
                results[name] = f"FAIL rowcount {len(srows)} vs {len(drows)}"
            elif srows != drows:
                diff = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
                results[name] = f"FAIL values {diff}"
            else:
                results[name] = f"MATCH ({len(srows)} rows)"
    except Exception as e:  # noqa: BLE001 — record, keep going
        entry["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = f"ERR {entry['err']}"
    record[name] = entry
    prefix = "" if pos < 50 else "[>50] "
    print(f"  [{time.time()-t0:6.1f}s] #{pos+1:02d} {prefix}{name}:"
          f" {results[name]}", flush=True)

for k, v in results.items():
    print(f"  {k}: {v}")
ok = all(("MATCH" in v or "rows-only" in v) for v in results.values())
print("ALL-MATCH:", ok)
if not filters:
    out = os.path.join(_REPO, "SELFCHECK.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    n_hash = sum(1 for e in record.values() if e["hash_match"])
    n_ro = sum(1 for e in record.values() if e["err"] == "no_oracle")
    print(f"SELFCHECK written: {out} — {len(record)} queries, "
          f"{n_hash} hash-match, {n_ro} rows-only")
