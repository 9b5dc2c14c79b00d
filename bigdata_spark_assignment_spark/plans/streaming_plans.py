"""Window-op queries (SURVEY.md §2.8/M6) — the STREAMING transformations
run on batch input.

Each query calls the exact function the streaming tests run
incrementally (streaming/ops.py); Structured Streaming's contract is
that the converged stream result equals this batch result, so the
DuckDB oracle checks the semantics once and the streaming tests check
the incremental path against the same functions
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..streaming.ops import session_agg, sliding_counts, tumbling_counts
from .registry import register


@register(
    "q46_tumbling_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start,
           time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS win_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
)
def tumbling_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows via ``F.window`` — same function the
    stream runs (streaming/ops.py:tumbling_counts)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "q47_sliding_window_counts",
    oracle="""
    WITH starts AS (
      SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS s FROM events
      UNION ALL
      SELECT event_type,
             time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' FROM events)
    SELECT s AS win_start, s + INTERVAL '10 minutes' AS win_end,
           event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM starts GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
)
def sliding_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10/5-minute windows — every event lands in exactly two
    windows (width/slide); oracle enumerates both starts per event."""
    return sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "q48_session_windows",
    oracle="""
    WITH o AS (
      -- CAST(ts AS TIMESTAMP): micro-truncate like Spark's load (io.py
      -- rule — DuckDB keeps nanos otherwise); break on >= because
      -- session_window's end is EXCLUSIVE (an event exactly gap after
      -- its predecessor starts a NEW session)
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                              ORDER BY CAST(ts AS TIMESTAMP)) AS prev_ts
      FROM events),
    marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts >= INTERVAL '5 minutes'
                     THEN 1 ELSE 0 END AS brk
      FROM o),
    sess AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT MIN(ts) AS sess_start,
           MAX(ts) + INTERVAL '5 minutes' AS sess_end,
           user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    tags=("streaming", "session"),
)
def session_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (``session_window``, 5-minute gap).
    Spark defines session end = last event + gap; the oracle rebuilds
    the same islands with a lag/cumsum breakpoint scan."""
    return session_agg(load_table(spark, sf_dir, "events"))


@register(
    "q68_stream_replay_equivalence",
    oracle=None,  # exercises the incremental engine itself; the query
                  # computes its own stream-vs-batch differential
    tags=("streaming", "replay"),
)
def stream_replay_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL incremental path, driver-visible: events replayed as a
    time-ordered file stream (``readStream`` + maxFilesPerTrigger=1, 6
    micro-batches), the same ``tumbling_counts`` transformation, run to
    completion — then differenced against the batch result. Output is
    one row: stream/batch row counts and exceptAll diffs (both must be
    0 — Structured Streaming's convergence guarantee, asserted here
    rather than only in pytest).

    Watermark + append-mode finalization is covered by
    tests/test_streaming.py; this query runs complete-mode so the
    converged table is comparable row-for-row with batch."""
    from ..streaming.replay import replay_as_stream, run_to_memory_sink

    events = load_table(spark, sf_dir, "events")
    stream = replay_as_stream(spark, events, n_chunks=6)
    # a streaming agg allocates state-store partitions from
    # spark.sql.shuffle.partitions AT QUERY START — under a default
    # session that is 200 state tasks × 6 micro-batches of overhead;
    # scope it down for the replay, restore after
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        stream_final = run_to_memory_sink(
            tumbling_counts(stream), "q68_sink", output_mode="complete")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    batch = tumbling_counts(
        events.withColumn("ts", F.col("ts").cast("timestamp")))
    n_stream = stream_final.agg(F.count(F.lit(1)).alias("n_stream_rows"))
    n_batch = batch.agg(F.count(F.lit(1)).alias("n_batch_rows"))
    only_s = stream_final.exceptAll(batch) \
        .agg(F.count(F.lit(1)).alias("n_only_stream"))
    only_b = batch.exceptAll(stream_final) \
        .agg(F.count(F.lit(1)).alias("n_only_batch"))
    return (n_stream.crossJoin(n_batch).crossJoin(only_s).crossJoin(only_b)
            .withColumn("converged",
                        (F.col("n_only_stream") == 0)
                        & (F.col("n_only_batch") == 0)
                        & (F.col("n_stream_rows") == F.col("n_batch_rows"))))


@register(
    "q70_stream_stream_join_replay",
    oracle=None,  # incremental engine differential, self-checking
    tags=("streaming", "join", "watermark"),
)
def stream_stream_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM time-range join, driver-visible: events replayed
    as a time-ordered file stream, split into watermarked view and
    purchase streams, inner-joined on (user, purchase within 10 min
    after view) in append mode — the state-bounded two-stream join —
    then differenced against the identical join on static frames.
    Output: one self-checking row (counts + exceptAll diffs, 0 iff the
    incremental join converged to batch semantics)."""
    from ..streaming.ops import join_purchases_after_views, with_watermark
    from ..streaming.replay import replay_as_stream, run_to_memory_sink

    events = load_table(spark, sf_dir, "events")
    stream = replay_as_stream(spark, events, n_chunks=6)
    sv = with_watermark(stream.filter(F.col("event_type") == "view"),
                        delay="30 minutes")
    sp = with_watermark(stream.filter(F.col("event_type") == "purchase"),
                        delay="30 minutes")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        stream_out = run_to_memory_sink(
            join_purchases_after_views(sv, sp), "q70_sink",
            output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    batch_events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    batch = join_purchases_after_views(
        batch_events.filter(F.col("event_type") == "view"),
        batch_events.filter(F.col("event_type") == "purchase"))
    n_stream = stream_out.agg(F.count(F.lit(1)).alias("n_stream_rows"))
    n_batch = batch.agg(F.count(F.lit(1)).alias("n_batch_rows"))
    only_s = stream_out.exceptAll(batch) \
        .agg(F.count(F.lit(1)).alias("n_only_stream"))
    only_b = batch.exceptAll(stream_out) \
        .agg(F.count(F.lit(1)).alias("n_only_batch"))
    return (n_stream.crossJoin(n_batch).crossJoin(only_s).crossJoin(only_b)
            .withColumn("converged",
                        (F.col("n_only_stream") == 0)
                        & (F.col("n_only_batch") == 0)
                        & (F.col("n_stream_rows") == F.col("n_batch_rows"))))
