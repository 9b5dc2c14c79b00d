"""Window-op queries (SURVEY.md §2.8/M6) — the STREAMING transformations
run on batch input, plus the REAL incremental replays.

Each batch query calls the exact function the streaming tests run
incrementally (streaming/ops.py); Structured Streaming's contract is
that the converged stream result equals this batch result, so the
DuckDB oracle checks the semantics once and the streaming tests check
the incremental path against the same functions
(tests/test_streaming.py). The replay suite (q68) then runs the
incremental engine itself, driver-visible, with an oracle that
re-derives the converged row counts in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..streaming.ops import session_agg, sliding_counts, tumbling_counts
from .registry import register


@register(
    "q46_stream_windows_suite",
    oracle="""
    SELECT 'tumbling' AS part,
           time_bucket(INTERVAL '5 minutes', ts) AS w_start,
           time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS w_end,
           event_type AS k,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 2, 3, 4
    UNION ALL
    SELECT 'sliding', s, s + INTERVAL '10 minutes', event_type,
           CAST(COUNT(*) AS BIGINT), CAST(NULL AS DOUBLE)
    FROM (
      SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS s FROM events
      UNION ALL
      SELECT event_type,
             time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' FROM events)
    GROUP BY 2, 4
    UNION ALL
    SELECT 'session', sess_start, sess_end, k, n_events, sum_value FROM (
      WITH o AS (
        -- CAST(ts AS TIMESTAMP): micro-truncate like Spark's load
        -- (io.py rule — DuckDB keeps nanos otherwise); break on >=
        -- because session_window's end is EXCLUSIVE (an event exactly
        -- gap after its predecessor starts a NEW session)
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
             CAST(user_id AS VARCHAR) AS k,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 4) AS sum_value
      FROM sess GROUP BY user_id, sid)
    """,
    tags=("streaming", "window", "session"),
)
def stream_windows_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed-aggregation family in one tagged result (merged r2
    q46+q47+q48 to free driver prefix slots) — each branch calls the
    SAME function the incremental stream runs (streaming/ops.py):

    * ``tumbling`` — 5-minute tumbling windows via ``F.window``.
    * ``sliding`` — 10/5-minute sliding windows; every event lands in
      exactly two windows (width/slide), the oracle enumerates both
      starts per event.
    * ``session`` — gap-based session windows (``session_window``,
      5-minute gap). Spark defines session end = last event + gap; the
      oracle rebuilds the same islands with a lag/cumsum breakpoint
      scan.
    """
    events = load_table(spark, sf_dir, "events")
    tumbling = tumbling_counts(events).select(
        F.lit("tumbling").alias("part"),
        F.col("win_start").alias("w_start"),
        F.col("win_end").alias("w_end"),
        F.col("event_type").alias("k"),
        "n_events", "sum_value")
    sliding = sliding_counts(events).select(
        F.lit("sliding").alias("part"),
        F.col("win_start").alias("w_start"),
        F.col("win_end").alias("w_end"),
        F.col("event_type").alias("k"),
        "n_events",
        F.lit(None).cast("double").alias("sum_value"))
    session = session_agg(events).select(
        F.lit("session").alias("part"),
        F.col("sess_start").alias("w_start"),
        F.col("sess_end").alias("w_end"),
        F.col("user_id").cast("string").alias("k"),
        "n_events", "sum_value")
    return tumbling.unionByName(sliding).unionByName(session)


@register(
    "q68_stream_replay_suite",
    oracle="""
    SELECT 'tumbling' AS part, n AS n_stream_rows, n AS n_batch_rows,
           CAST(0 AS BIGINT) AS n_only_stream,
           CAST(0 AS BIGINT) AS n_only_batch,
           TRUE AS converged
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT time_bucket(INTERVAL '5 minutes', ts), event_type
        FROM events GROUP BY 1, 2))
    UNION ALL
    SELECT 'join', m, m, 0, 0, TRUE
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS m
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'view') v
      JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase') p
        ON v.user_id = p.user_id
       AND p.ts >= v.ts
       AND p.ts <= v.ts + INTERVAL '10 minutes')
    UNION ALL
    SELECT 'stateful', u, u, 0, 0, TRUE
    FROM (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u FROM events)
    UNION ALL
    SELECT 'dedup', d, d, 0, 0, TRUE
    FROM (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS d FROM events)
    UNION ALL
    SELECT 'topk', d, d, 0, 0, TRUE
    FROM (SELECT CAST(COUNT(DISTINCT event_type || ':' ||
                 CAST(user_id % 100 AS VARCHAR)) AS BIGINT) AS d
          FROM events)
    UNION ALL
    SELECT 'late', w, w, 0, 0, TRUE
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS w FROM (
        SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS s,
               event_type
        FROM events GROUP BY 1, 2) g
      WHERE g.s + INTERVAL '5 minutes' <
            (SELECT MAX(CAST(ts AS TIMESTAMP)) - INTERVAL '10 minutes'
             FROM events))
    """,
    tags=("streaming", "replay", "join", "watermark", "stateful",
          "dedup", "topk", "sketch"),
)
def stream_replay_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL incremental engine, driver-visible (merged r2 q68+q70):
    events replayed as a time-ordered file stream (``readStream`` +
    maxFilesPerTrigger=1, 6 micro-batches), run to completion, then
    differenced against the identical transformation on static frames.

    * ``tumbling`` — the q46 tumbling aggregation in complete mode, so
      the converged table is comparable row-for-row with batch.
    * ``join`` — stream-STREAM time-range inner join (purchases within
      10 min after a view by the same user) in append mode with
      30-minute watermarks on both sides — the state-bounded two-stream
      join.
    * ``stateful`` — the CUSTOM stateful operator
      (``applyInPandasWithState`` running per-user totals,
      streaming/stateful.py) replayed in update mode; the LAST emission
      per key (totals are monotone, so last = max n_events) must equal
      the batch aggregate: integer state diffed exactly, float sums
      within 1e-6 (incremental partial-sum order differs from batch).
    * ``dedup`` — ``dropDuplicatesWithinWatermark`` on a stream of the
      events table unioned with itself (every row arrives exactly
      twice, duplicates at the same event time, so always inside the
      30-minute horizon); the converged output must be one row per
      event_id, identical to batch ``dropDuplicates``.
    * ``topk`` — r7 session 3: streaming Misra-Gries heavy hitters
      (streaming/stateful.py ``mg_heavy_hitters``) — the second
      custom stateful operator, with ARRAY state: each hash bucket's
      state is its full bounded MG summary, replayed in update mode.
      Domain (event_type x user_id mod 100) sits far below the
      per-bucket capacity, so MG never decrements, every count is
      exact, and the last emission per item must equal the batch
      count table integer-for-integer (the decrement path is covered
      on a hand stream in tests/test_streaming.py).
    * ``late`` — watermark/late-data semantics, driver-visible: the
      on-time chunks replay in event-time order, then ONE extra chunk
      re-sends the EARLIEST 400 events (fresh ids, original old
      timestamps) after the watermark has passed them. In append mode
      the finalized output must equal the batch tumbling aggregate
      over ON-TIME events restricted to windows closed by the final
      watermark (max on-time ts − 10 min): every late row targets a
      closed window, so all are dropped; open windows never finalize
      before the stream ends. Both the window set and the counts are
      diffed; the oracle re-derives the closed-window count in SQL.

    Oracle-backed (r3): the converged stream row count must equal the
    batch row count, and the ORACLE re-derives that batch count in SQL
    (window group count / time-range join count / distinct user and
    event counts) — so the hash check pins the incremental engine's
    convergence against an independent engine, not against Spark
    itself. The exceptAll diff columns are pinned at zero (Structured
    Streaming's convergence guarantee). Watermark + append-mode
    finalization is covered by tests/test_streaming.py."""
    from pyspark.sql import Window as W

    from ..streaming.ops import (
        dedup_events,
        join_purchases_after_views,
        with_watermark,
    )
    from ..streaming.replay import (
        replay_as_stream,
        replay_with_late_chunk,
        run_to_memory_sink,
    )
    from ..streaming.stateful import mg_heavy_hitters, running_totals

    import shutil
    import tempfile

    events = load_table(spark, sf_dir, "events")
    batch_events = events.withColumn("ts", F.col("ts").cast("timestamp"))

    # one scratch root for all five replays, removed after the
    # localCheckpoint barriers materialize the sink contents (ADVICE
    # r2 precedent: never leak a full table copy per run)
    scratch = tempfile.mkdtemp(prefix="spark_q68_replays_")

    def _dir(name: str) -> str:
        return f"{scratch}/{name}"

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # a streaming agg allocates state-store partitions from
    # spark.sql.shuffle.partitions AT QUERY START — under a default
    # session that is 200 state tasks × 6 micro-batches of overhead;
    # scope it down for the replays, restore after
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        stream1 = replay_as_stream(spark, events, n_chunks=6,
                                   dir_path=_dir("tumb"))
        tumb_stream = run_to_memory_sink(
            tumbling_counts(stream1), "q68_tumb_sink", output_mode="complete")

        stream2 = replay_as_stream(spark, events, n_chunks=6,
                                   dir_path=_dir("join"))
        sv = with_watermark(stream2.filter(F.col("event_type") == "view"),
                            delay="30 minutes")
        sp = with_watermark(stream2.filter(F.col("event_type") == "purchase"),
                            delay="30 minutes")
        join_stream = run_to_memory_sink(
            join_purchases_after_views(sv, sp), "q68_join_sink",
            output_mode="append")

        stream3 = replay_as_stream(spark, events, n_chunks=6,
                                   dir_path=_dir("state"))
        state_stream = run_to_memory_sink(
            running_totals(stream3), "q68_state_sink", output_mode="update")

        dup_events = events.unionAll(events)
        stream4 = replay_as_stream(spark, dup_events, n_chunks=6,
                                   dir_path=_dir("dedup"))
        dedup_stream = run_to_memory_sink(
            dedup_events(stream4, delay="30 minutes"), "q68_dedup_sink",
            output_mode="append")

        late_rows = (batch_events.orderBy("ts").limit(400)
                     .withColumn("event_id",
                                 F.col("event_id") + F.lit(10_000_000)))
        stream5 = replay_with_late_chunk(spark, events, late_rows,
                                         n_chunks=6,
                                         dir_path=_dir("late"))
        late_stream = run_to_memory_sink(
            tumbling_counts(with_watermark(stream5, delay="10 minutes")),
            "q68_late_sink", output_mode="append")

        # topk (r7 session 3): streaming Misra-Gries heavy hitters —
        # the second custom stateful operator, with ARRAY state (the
        # full bounded MG summary per hash bucket). Domain =
        # event_type x (user_id % 100) ≈ a few hundred items, capacity
        # 1024 per bucket ⇒ MG never decrements ⇒ every count exact ⇒
        # the converged summary must equal batch counts row-for-row
        _mg_item = F.concat(F.col("event_type"), F.lit(":"),
                            F.pmod(F.col("user_id"), F.lit(100))
                            .cast("string"))
        stream6 = replay_as_stream(spark, events, n_chunks=6,
                                   dir_path=_dir("topk"))
        topk_stream = run_to_memory_sink(
            mg_heavy_hitters(stream6, _mg_item, capacity=1024,
                             n_buckets=8),
            "q68_topk_sink", output_mode="update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    # Partitioning barrier. A sink DataFrame whose plan was CREATED
    # under the scoped shuffle.partitions=16 but EXECUTED after the
    # restore can satisfy a downstream aggregate's clustered
    # distribution with its stale 16-partition hash (observed: the
    # stateful branch's exceptAll grouped each side's identical rows in
    # DIFFERENT partitions — every row "only_stream", none
    # "only_batch"). localCheckpoint severs the captured plan, so
    # downstream exchanges are planned fresh under the restored conf.
    tumb_stream = tumb_stream.localCheckpoint()
    join_stream = join_stream.localCheckpoint()
    state_stream = state_stream.localCheckpoint()
    dedup_stream = dedup_stream.localCheckpoint()
    late_stream = late_stream.localCheckpoint()
    topk_stream = topk_stream.localCheckpoint()
    shutil.rmtree(scratch, ignore_errors=True)

    def _diff_row(part: str, stream_df: DataFrame,
                  batch_df: DataFrame) -> DataFrame:
        n_s = stream_df.agg(F.count(F.lit(1)).alias("n_stream_rows"))
        n_b = batch_df.agg(F.count(F.lit(1)).alias("n_batch_rows"))
        only_s = stream_df.exceptAll(batch_df).agg(
            F.count(F.lit(1)).alias("n_only_stream"))
        only_b = batch_df.exceptAll(stream_df).agg(
            F.count(F.lit(1)).alias("n_only_batch"))
        return (n_s.crossJoin(n_b).crossJoin(only_s).crossJoin(only_b)
                .select(F.lit(part).alias("part"),
                        "n_stream_rows", "n_batch_rows",
                        "n_only_stream", "n_only_batch")
                .withColumn("converged",
                            (F.col("n_only_stream") == 0)
                            & (F.col("n_only_batch") == 0)
                            & (F.col("n_stream_rows")
                               == F.col("n_batch_rows"))))

    tumb = _diff_row("tumbling", tumb_stream, tumbling_counts(batch_events))
    join = _diff_row(
        "join", join_stream,
        join_purchases_after_views(
            batch_events.filter(F.col("event_type") == "view"),
            batch_events.filter(F.col("event_type") == "purchase")))

    # stateful: converged state = LAST update-mode emission per key
    # (totals are monotone in n_events, so last = max n_events)
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    stream_final = (state_stream.withColumn("rn", F.row_number().over(w))
                    .filter(F.col("rn") == 1).drop("rn"))
    batch_final = running_totals(batch_events)
    state_diff = _diff_row("stateful",
                           stream_final.select("user_id", "n_events"),
                           batch_final.select("user_id", "n_events"))
    # float sums: incremental per-batch accumulation orders the partial
    # sums differently than the batch aggregate — compare by tolerance,
    # not equality (the integer state above is diffed exactly)
    sum_ok = (stream_final.select("user_id", F.col("sum_value").alias("s_s"))
              .join(batch_final.select("user_id",
                                       F.col("sum_value").alias("s_b")),
                    "user_id")
              .agg((F.max(F.abs(F.col("s_s") - F.col("s_b"))) < F.lit(1e-6))
                   .alias("sums_close")))
    stateful = (state_diff.crossJoin(sum_ok)
                .withColumn("converged",
                            F.col("converged") & F.col("sums_close"))
                .drop("sums_close"))

    dedup = _diff_row(
        "dedup", dedup_stream.select("event_id"),
        dedup_events(batch_events.unionAll(batch_events))
        .select("event_id"))

    # late: expected = batch tumbling over ON-TIME events, windows
    # closed by the final watermark (max on-time ts − delay)
    wm_final = batch_events.agg(
        (F.max("ts") - F.expr("INTERVAL 10 minutes")).alias("wm")) \
        .first().wm
    # Boundary discipline (ADVICE r4): a window whose end EQUALS the
    # final watermark sits exactly on append-mode's eviction boundary —
    # whether Spark finalizes it depends on an internal >= vs >
    # predicate. Compare strictly-closed windows only (win_end <
    # wm_final) on BOTH the stream output and the batch expectation
    # (oracle SQL mirrors the strict <), so a max on-time ts landing on
    # a 5-minute boundary cannot flip `converged`.
    late_expected = tumbling_counts(batch_events).filter(
        F.col("win_end") < F.lit(wm_final))
    late = _diff_row("late",
                     late_stream.filter(F.col("win_end") < F.lit(wm_final)),
                     late_expected)

    # topk: converged MG summary = LAST emission per item (counts are
    # monotone in the never-decrement regime, so last = max); batch
    # path of the same operator is the exact group-by count table
    wt = W.partitionBy("item").orderBy(F.col("mg_count").desc())
    topk_final = (topk_stream.withColumn("rn", F.row_number().over(wt))
                  .filter(F.col("rn") == 1).drop("rn"))
    topk = _diff_row("topk", topk_final,
                     mg_heavy_hitters(batch_events, _mg_item))

    return (tumb.unionByName(join).unionByName(stateful)
            .unionByName(dedup).unionByName(late).unionByName(topk))
