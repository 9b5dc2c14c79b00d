"""Driver-contract smoke: entry() runs at sf0.001 and yields rows."""

from __future__ import annotations

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty",
                               "count_order"}


def test_queries_and_oracles_aligned():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)
