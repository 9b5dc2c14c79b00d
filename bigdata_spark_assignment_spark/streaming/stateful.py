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


def mg_heavy_hitters(df: DataFrame, item_expr, capacity: int = 1024,
                     n_buckets: int = 8) -> DataFrame:
    """Streaming Misra–Gries heavy hitters — the second custom
    stateful operator, with NON-SCALAR state: each group's state is
    the full bounded MG summary (parallel item/count arrays), not a
    pair of scalars. The stream-side twin of
    ``operators.sketches.heavy_hitters``'s per-partition summaries.

    Sharding: items group by ``xxhash64(item) % n_buckets`` so each
    bucket maintains an independent MG summary over ITS item subset —
    MG summaries over disjoint substreams are trivially mergeable
    (the batch operator's mapInPandas + merge shape, with the state
    store playing the role of the merge). State per bucket is
    ≤ capacity entries regardless of stream length.

    Exactness contract (what q68 diffs): while a bucket's distinct
    item count stays ≤ capacity, MG never decrements and every count
    is EXACT — so with capacity sized above the domain, the last
    emission per bucket must equal the batch group-by count table
    row-for-row, integer-exact. Past capacity the standard MG
    guarantee (count ≥ true − n_bucket/capacity) takes over; pytest
    covers the decrement path on a hand stream.

    Batch input returns the equivalent exact aggregate (same output
    schema, final-state semantics), like ``running_totals``.
    """
    items = df.select(item_expr.cast("string").alias("item"))
    if not df.isStreaming:
        return items.groupBy("item").agg(
            F.count(F.lit(1)).alias("mg_count"))

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = items.withColumn(
        "bucket", F.pmod(F.xxhash64("item"), F.lit(n_buckets)))
    out_schema = "item string, mg_count long"
    state_schema = "items array<string>, counts array<long>"

    def fold(key, pdfs, state):
        # self-contained closure: executors need no package import
        import pandas as pd
        if state.exists:
            st_items, st_counts = state.get
            summ = dict(zip(st_items, st_counts))
        else:
            summ = {}
        for pdf in pdfs:
            for it in pdf["item"]:
                if it in summ:
                    summ[it] += 1
                elif len(summ) < capacity:
                    summ[it] = 1
                else:
                    # the MG decrement: every tracked count pays for
                    # the untracked arrival; zeros evict
                    for k in list(summ):
                        summ[k] -= 1
                        if summ[k] == 0:
                            del summ[k]
        ks = sorted(summ)
        state.update((ks, [summ[k] for k in ks]))
        yield pd.DataFrame({"item": ks,
                            "mg_count": [summ[k] for k in ks]})

    return (keyed.groupBy("bucket")
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))
