"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8 north star — the escape hatch when built-in windowed
aggregation can't express the state machine).

``running_totals``: per-key cumulative (count, sum) emitted on every
micro-batch that touches the key — the minimal real example of
arbitrary user state: read state, fold the Arrow batches, write state,
emit. Batch equivalence: the LAST emission per key equals the batch
``groupBy().agg(count, sum)`` (asserted in tests; totals are monotone
so "last" = max count).

100 TB notes: state lives in the state store partitioned by key —
size ∝ distinct keys, not events. Unlike the window ops there is no
watermark here, so keys are never evicted: production usage pairs
this with ``GroupStateTimeout`` (processing/event-time) to retire idle
keys; the test-scale default keeps NoTimeout for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def running_totals(df: DataFrame, key_col: str = "user_id",
                   value_col: str = "value") -> DataFrame:
    """Per-key running (n_events, sum_value). Streaming input →
    stateful incremental op; batch input → the equivalent aggregate
    (same output schema, final-state semantics)."""
    if not df.isStreaming:
        return df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"))

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def fold(key, pdfs, state):
        # self-contained closure: executors need no package import
        import pandas as pd
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]],
                            "n_events": [n], "sum_value": [s]})

    return (df.groupBy(key_col)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))
