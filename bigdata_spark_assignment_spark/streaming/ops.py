"""Streaming transformations (batch/stream-agnostic DataFrames).

Each op is a plain ``DataFrame -> DataFrame`` so the identical code
path runs under ``spark.read`` (batch) and ``spark.readStream``
(incremental). That is the engine's streaming semantics guarantee:
a windowed aggregate's final result after all data arrives equals the
batch aggregate over the same data (asserted in tests).

100 TB notes: streaming state (window aggs, dedup sets) lives in the
state store keyed by (group, window); the watermark bounds state size
— without it, session/dedup state grows forever. Late rows beyond the
watermark are dropped, which is the documented trade: state memory ∝
watermark horizon × key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts",
                   delay: str = "10 minutes") -> DataFrame:
    """Late-data horizon: rows later than ``delay`` behind the max
    event time seen are dropped from stateful ops. No-op semantics on
    batch DataFrames (batch sees all data, nothing is 'late')."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay)
    return df


def tumbling_counts(df: DataFrame, width: str = "5 minutes",
                    ts_col: str = "ts",
                    group_col: str = "event_type") -> DataFrame:
    """Tumbling-window counts + value sum per group. Window start/end
    are surfaced as plain timestamp columns so batch and stream (and a
    SQL oracle) can compare row-for-row."""
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("w"),
                   F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"),
                group_col, "n_events", "sum_value")
    )


def sliding_counts(df: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes", ts_col: str = "ts",
                   group_col: str = "event_type") -> DataFrame:
    """Sliding-window counts: each event lands in width/slide windows
    (state ∝ overlap factor — keep it small at scale)."""
    return (
        df.groupBy(F.window(F.col(ts_col), width, slide).alias("w"),
                   F.col(group_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"),
                group_col, "n_events")
    )


def session_agg(df: DataFrame, gap: str = "5 minutes",
                ts_col: str = "ts", key_col: str = "user_id") -> DataFrame:
    """Session windows: activity runs per key closed by a ``gap`` of
    silence (``session_window`` — dynamic, data-driven windows; state
    closes when the watermark passes last_event + gap)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                   F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("sess_start"),
                F.col("w.end").alias("sess_end"),
                key_col, "n_events", "sum_value")
    )


def dedup_events(df: DataFrame, keys: list[str] | None = None,
                 ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Stream deduplication on event id within the watermark horizon
    (``dropDuplicatesWithinWatermark`` keeps the id-set bounded); on
    batch input, plain dropDuplicates — same final semantics when all
    duplicates arrive within the horizon."""
    keys = keys or ["event_id"]
    if df.isStreaming:
        return df.withWatermark(ts_col, delay) \
                 .dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def join_purchases_after_views(views: DataFrame, purchases: DataFrame,
                               horizon: str = "10 minutes") -> DataFrame:
    """Stream-stream (or batch-batch — same code) inner join: purchases
    within ``horizon`` AFTER a view by the same user.

    On streams both inputs must carry watermarks (caller applies
    ``with_watermark``); the time-range condition lets Spark bound the
    join state — each side's buffer is evicted once the other side's
    watermark passes the range. Without the range bound, stream-stream
    join state grows forever.
    """
    v = views.alias("v")
    p = purchases.alias("p")
    cond = ((F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("v.ts"))
            & (F.col("p.ts") <= F.col("v.ts") + F.expr(f"INTERVAL {horizon}")))
    return v.join(p, cond).select(
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("v.ts").alias("view_ts"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.round(F.col("p.value"), 4).alias("purchase_value"))
