"""Simulate the driver: import __spark_entry__ from outside the repo,
run entry() smoke, run each queries()[name] at sf0.01, compare against
oracle_sql() under DuckDB (row count + sorted columns + values)."""
import importlib.util, json, sys
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# t1 smoke
df = mod.entry(spark)
rows = df.collect()
print("SMOKE entry(): rows =", len(rows), "cols =", df.columns)

# t2 correctness
import duckdb, math, datetime as dt
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, dt.datetime): return v.replace(tzinfo=None).isoformat()
    return v

qs, oracles = mod.queries(), mod.oracle_sql()
results = {}
import time
for name, fn in sorted(qs.items()):
    t0 = time.time()
    sdf = fn(spark, SF)
    scols = sorted(sdf.columns)
    srows = sorted([tuple(norm(r[c]) for c in scols) for r in (row.asDict() for row in sdf.collect())], key=repr)
    if name not in oracles:
        results[name] = f"rows-only: {len(srows)} rows OK"
        print(f"  [{time.time()-t0:6.1f}s] {name}: {results[name]}", flush=True)
        continue
    res = con.execute(oracles[name])
    dcols_raw = [d[0] for d in res.description]
    dcols = sorted(dcols_raw)
    idx = [dcols_raw.index(c) for c in dcols]
    drows = sorted([tuple(norm(r[i]) for i in idx) for r in res.fetchall()], key=repr)
    if scols != dcols: results[name] = f"FAIL cols {scols} vs {dcols}"
    elif len(srows) != len(drows): results[name] = f"FAIL rowcount {len(srows)} vs {len(drows)}"
    elif srows != drows:
        diff = [(a,b) for a,b in zip(srows,drows) if a!=b][:2]
        results[name] = f"FAIL values {diff}"
    else: results[name] = f"MATCH ({len(srows)} rows)"
    print(f"  [{time.time()-t0:6.1f}s] {name}: {results[name]}", flush=True)
for k,v in results.items(): print(f"  {k}: {v}")
print("ALL-MATCH:", all(("MATCH" in v or "rows-only" in v) for v in results.values()))
