"""Relational operator helpers (SURVEY.md §2.4-2.6).

These are the engine-level building blocks behind the named queries:
distinct-count with the reference's null-as-a-group semantics, top-k
per group, and join conveniences. All pure DataFrame/Column
compositions — Catalyst sees through every one of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def distinct_count_expr(col: Column) -> Column:
    """Aggregate expression: number of distinct values of ``col``,
    **counting NULL as a value** — the reference's double-groupBy idiom
    (``Main.scala:133,192``: ``groupBy(c).count().groupBy(c).count()
    .count()``) pays two shuffles for this; ``count_distinct`` alone
    under-counts by one when NULLs are present.

    ``count_distinct(c) + max(int(c IS NULL))`` gets the same answer in
    a single aggregation (one shuffle, map-side partials).
    """
    return (
        F.count_distinct(col)
        + F.coalesce(F.max(F.when(col.isNull(), 1).otherwise(0)), F.lit(0))
    ).cast("long")


def distinct_count(df: DataFrame, col: str | Column) -> int:
    """Eager form: distinct count (null counted) as a Python int.

    Used for join guards like the reference's ``Main.scala:132-139``
    (join only if the key has >1 distinct value).
    """
    c = F.col(col) if isinstance(col, str) else col
    return df.agg(distinct_count_expr(c).alias("n")).first()["n"]


def top_k_per_group(df: DataFrame, group_cols: list[str],
                    order_by: list[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    """Top-k rows per group via a ranking window.

    Callers must make ``order_by`` a total order (append a unique key)
    if they need deterministic output under ties.

    100 TB notes: one shuffle on ``group_cols``; each partition ranks
    locally after the shuffle sort. For small k and huge groups this
    beats a global sort by orders of magnitude.
    """
    w = W.partitionBy(*group_cols).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))


def join_guarded(fact: DataFrame, dim: DataFrame, on: str,
                 how: str = "inner", broadcast_dim: bool = True) -> DataFrame:
    """Conditional join (J2, ``Main.scala:132-139``): join only when the
    key actually discriminates (>1 distinct value on the fact side);
    otherwise return the fact unchanged."""
    if distinct_count(fact, on) <= 1:
        return fact
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on, how)
