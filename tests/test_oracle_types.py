"""Oracle column-type lint (VERDICT r5 "Next round" #2).

The driver's value hash is type-sensitive: a DuckDB aggregate that
silently promotes (SUM(BIGINT) -> HUGEINT, AVG -> DOUBLE vs DECIMAL)
flips the hash even when every value is identical.  This happened
twice (r1 typing lessons; r5 q10 gini leg), so this test kills the
class permanently: for every registered oracle it asks DuckDB for the
relation's column types WITHOUT executing it (``con.sql(...).types``
is lazy) and requires each to be the exact canonical image of the
Spark plan's schema.

Allowed equivalences (both sides are naive/exact):
  * spark ``timestamp`` / ``timestamp_ntz``  <-> duck ``TIMESTAMP``
Everything else must map 1:1 (bigint<->BIGINT, int<->INTEGER, ...).
"""

from __future__ import annotations

import duckdb
import pytest

from bigdata_spark_assignment_spark.io import TABLE_NAMES
from bigdata_spark_assignment_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"

_CANON = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "binary": {"BLOB"},
    "timestamp": {"TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def _allowed(spark_simple: str) -> set[str]:
    if spark_simple.startswith("decimal("):
        return {"DECIMAL" + spark_simple[7:].upper()}
    if spark_simple.startswith("array<") and spark_simple.endswith(">"):
        return {t + "[]" for t in _allowed(spark_simple[6:-1])}
    return _CANON.get(spark_simple, set())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n in REGISTRY if REGISTRY[n].oracle])
def test_oracle_types_match_spark_schema(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF)
    spark_types = {f.name: f.dataType.simpleString()
                   for f in sdf.schema.fields}
    rel = duck.sql(spec.oracle)  # lazy: type inference only, no scan
    duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    assert sorted(spark_types) == sorted(duck_types), (
        f"{name}: column sets differ: spark={sorted(spark_types)} "
        f"duck={sorted(duck_types)}")
    bad = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if duck_types[c] not in _allowed(spark_types[c])
    }
    assert not bad, (
        f"{name}: oracle/engine type drift (CAST the oracle aggregate "
        f"or the Spark column): {bad}")
