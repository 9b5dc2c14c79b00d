"""Every registered query with an oracle must match DuckDB at sf0.01 —
a local pre-run of the driver's correctness gate."""

from __future__ import annotations

import pytest

from bigdata_spark_assignment_spark.plans import REGISTRY

from .oracle_utils import compare_query_to_oracle

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_oracle, name):
    q = REGISTRY[name]
    ok, msg = compare_query_to_oracle(spark, sf_oracle, q.fn, q.oracle)
    assert ok, f"{name}: {msg}"


def test_rows_only_queries_run(spark, sf_smoke):
    for name, q in REGISTRY.items():
        if q.oracle is None:
            df = q.fn(spark, sf_smoke)
            assert df.columns, f"{name}: no columns"
            df.collect()  # must execute without error
