"""M6 batch-equivalence tests: each streaming op, run incrementally
(file replay, one file per micro-batch, availableNow) must converge to
the same final result as the identical transformation on the static
DataFrame (SURVEY.md §7 M6 contract)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.io import load_table
from bigdata_spark_assignment_spark.streaming import (
    dedup_events,
    replay_as_stream,
    run_to_memory_sink,
    session_agg,
    sliding_counts,
    tumbling_counts,
    with_watermark,
)


@pytest.fixture(scope="module")
def events(spark, sf_smoke):
    return load_table(spark, sf_smoke, "events").cache()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_counts_batch_equivalence(spark, events, tmp_path):
    stream = replay_as_stream(spark, events, n_chunks=6,
                              dir_path=str(tmp_path))
    out = run_to_memory_sink(
        tumbling_counts(with_watermark(stream, delay="10 minutes")),
        "t_tumbling", output_mode="complete")
    batch = tumbling_counts(events)
    cols = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    assert _rows(out, cols) == _rows(batch, cols)
    assert out.count() > 0


def test_sliding_counts_batch_equivalence(spark, events, tmp_path):
    stream = replay_as_stream(spark, events, n_chunks=4,
                              dir_path=str(tmp_path))
    out = run_to_memory_sink(
        sliding_counts(with_watermark(stream, delay="10 minutes")),
        "t_sliding", output_mode="complete")
    batch = sliding_counts(events)
    cols = ["win_start", "win_end", "event_type", "n_events"]
    assert _rows(out, cols) == _rows(batch, cols)
    # each event lands in width/slide = 2 windows
    assert out.agg(F.sum("n_events")).first()[0] == 2 * events.count()


def test_session_agg_batch_equivalence(spark, events, tmp_path):
    stream = replay_as_stream(spark, events, n_chunks=4,
                              dir_path=str(tmp_path))
    out = run_to_memory_sink(
        session_agg(with_watermark(stream, delay="10 minutes")),
        "t_session", output_mode="complete")
    batch = session_agg(events)
    cols = ["sess_start", "sess_end", "user_id", "n_events", "sum_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_stream_dedup_batch_equivalence(spark, events, tmp_path):
    # plant duplicates: every event twice (same event_id)
    doubled = events.unionByName(events)
    stream = replay_as_stream(spark, doubled.orderBy("ts"), n_chunks=4,
                              dir_path=str(tmp_path))
    out = run_to_memory_sink(dedup_events(stream), "t_dedup",
                             output_mode="append")
    assert out.count() == events.count()
    assert _rows(out.select("event_id"), ["event_id"]) == \
        _rows(events.select("event_id"), ["event_id"])


def test_late_data_dropped_beyond_watermark(spark, events, tmp_path):
    """A watermark must bound state: with a tiny delay and time-ordered
    replay, every window still closes correctly under availableNow
    (all data eventually arrives; equivalence holds because replay is
    in order — THE documented precondition)."""
    stream = replay_as_stream(spark, events, n_chunks=6,
                              dir_path=str(tmp_path))
    out = run_to_memory_sink(
        tumbling_counts(with_watermark(stream, delay="1 minutes")),
        "t_late", output_mode="append")
    # append mode only emits CLOSED windows; the final (still-open at
    # end-of-stream) windows are withheld => strictly fewer or equal
    batch = tumbling_counts(events)
    assert 0 < out.count() <= batch.count()
    # emitted windows match batch values exactly
    cols = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    emitted = {t[:3]: t for t in _rows(out, cols)}
    batch_map = {t[:3]: t for t in _rows(batch, cols)}
    for key, row in emitted.items():
        assert batch_map[key] == row


def test_stateful_running_totals_batch_equivalence(spark, events, tmp_path):
    """applyInPandasWithState: the last per-key emission must equal the
    batch aggregate (totals are monotone, so last = max n_events)."""
    from bigdata_spark_assignment_spark.streaming.stateful import (
        running_totals,
    )
    stream = replay_as_stream(spark, events, n_chunks=5,
                              dir_path=str(tmp_path))
    out = run_to_memory_sink(running_totals(stream), "t_stateful",
                             output_mode="update")
    # several emissions per key (one per touching batch); take the last
    final = {}
    for r in out.collect():
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            final[r.user_id] = (r.n_events, r.sum_value)
    batch = {r.user_id: (r.n_events, r.sum_value)
             for r in running_totals(events).collect()}
    assert set(final) == set(batch)
    for k in batch:
        assert final[k][0] == batch[k][0], k
        assert abs(final[k][1] - batch[k][1]) < 1e-6, k
    # incremental emissions actually happened (more rows than keys)
    assert out.count() > len(batch)


def test_stream_stream_join_batch_equivalence(spark, events, tmp_path):
    """Stream-stream time-range join == the same join on static frames
    (append mode; the range condition bounds both buffers)."""
    from bigdata_spark_assignment_spark.streaming.ops import (
        join_purchases_after_views,
    )
    stream = replay_as_stream(spark, events, n_chunks=5,
                              dir_path=str(tmp_path))
    sv = with_watermark(stream.filter(F.col("event_type") == "view"),
                        delay="30 minutes")
    sp = with_watermark(stream.filter(F.col("event_type") == "purchase"),
                        delay="30 minutes")
    out = run_to_memory_sink(join_purchases_after_views(sv, sp),
                             "t_ssjoin", output_mode="append")
    batch_events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    bv = batch_events.filter(F.col("event_type") == "view")
    bp = batch_events.filter(F.col("event_type") == "purchase")
    batch = join_purchases_after_views(bv, bp)
    cols = ["user_id", "view_id", "purchase_id", "purchase_value"]
    assert _rows(out, cols) == _rows(batch, cols)
    assert out.count() > 0


def test_rate_source_available_now_batch_equivalence(spark, tmp_path):
    """Non-file source smoke (VERDICT r3 #8): the rate-micro-batch
    source under ``trigger=availableNow`` — semantics the file-replay
    suite can't exercise because rate rows are engine-generated, not
    listed from a directory. Each availableNow run is a BOUNDED drain
    of exactly one deterministic batch (rowsPerBatch rows, timestamps
    advancing advanceMillisPerBatch per batch); a checkpoint resumes
    offsets AND watermark state across bounded runs, so successive
    runs behave like one continuous stream cut into pieces.

    Checked: (1) two checkpointed raw runs drain exactly batches 0
    and 1 (gapless values, the two expected timestamps); (2) a
    watermarked tumbling aggregate run four times emits the closed
    1-second windows with exactly rowsPerBatch rows each — equal to
    the same aggregate computed statically on the drained rows."""

    def rate():
        return (spark.readStream.format("rate-micro-batch")
                .option("rowsPerBatch", 50)
                .option("numPartitions", 2)
                .option("startTimestamp", 0)
                .option("advanceMillisPerBatch", 1000)
                .load())

    def run_once(stream_df, out, ck):
        q = (stream_df.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(120), "availableNow run did not finish"

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # state-store partition count is fixed by the FIRST run's conf and
    # must stay consistent across checkpointed restarts — scope it
    # down for all runs, restore after
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        raw_out, raw_ck = str(tmp_path / "raw_out"), str(tmp_path / "raw_ck")
        for _ in range(2):
            run_once(rate().select("timestamp", "value"), raw_out, raw_ck)
        raw = spark.read.parquet(raw_out)
        got = {(r.timestamp.second, r.value) for r in raw.collect()}
        expected = {(v // 50, v) for v in range(100)}
        assert got == expected  # gapless batches 0 and 1, nothing else

        agg_out, agg_ck = str(tmp_path / "agg_out"), str(tmp_path / "agg_ck")
        windowed = (rate().withWatermark("timestamp", "0 seconds")
                    .groupBy(F.window("timestamp", "1 second").alias("w"))
                    .agg(F.count(F.lit(1)).alias("n")))
        for _ in range(4):
            run_once(windowed, agg_out, agg_ck)
        wins = {r.w.start.second: r.n
                for r in spark.read.parquet(agg_out).collect()}
        # after 4 batches (max ts = 3s) the watermark is 3s: windows
        # [0,1) and [1,2) are strictly closed and must have emitted;
        # [2,3) ends exactly ON the watermark (eviction-boundary
        # ambiguity — see q68's late-part discipline), so tolerate
        # either; nothing later may exist
        assert wins[0] == 50 and wins[1] == 50
        assert set(wins) <= {0, 1, 2}
        if 2 in wins:
            assert wins[2] == 50
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_checkpoint_crash_resume_exactly_once(spark, events, tmp_path):
    """Failure injection (r5, VERDICT r4 #6): kill the query MID-replay
    and resume from the checkpoint — the q68-shaped tumbling aggregate
    must come out exactly-once.

    Phase 1 starts an unbounded (processing-time) run over a 16-chunk
    file replay and calls ``stop()`` as soon as ≥2 micro-batches have
    committed — from the checkpoint's perspective a stop with no
    graceful state flush, i.e. crash-equivalent: recovery replays the
    last uncommitted batch from source offsets. Phase 2 resumes the
    SAME checkpoint with ``availableNow`` and drains the rest. Phase 3
    resumes once more and must be a strict no-op (offset log already
    at end). Exactly-once is asserted on the parquet SINK through its
    ``_spark_metadata`` commit log: no duplicate windows, every
    emitted window bit-equal to the static aggregate, and every
    strictly-closed window present."""
    import time as _time

    stream = replay_as_stream(spark, events, n_chunks=16,
                              dir_path=str(tmp_path / "replay"))
    agg = tumbling_counts(with_watermark(stream, delay="1 minutes"))
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def start(bounded: bool):
        w = (agg.writeStream.format("parquet")
             .option("path", out_dir).option("checkpointLocation", ck)
             .outputMode("append"))
        if bounded:
            w = w.trigger(availableNow=True)
        return w.start()

    q = start(bounded=False)
    deadline = _time.time() + 120
    while _time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["batchId"] >= 2:
            break
        _time.sleep(0.1)
    q.stop()                      # crash-equivalent mid-replay kill
    q.awaitTermination(60)

    q2 = start(bounded=True)
    assert q2.awaitTermination(180), "resume drain did not finish"
    n_after_resume = spark.read.parquet(out_dir).count()

    q3 = start(bounded=True)      # second resume: strict no-op
    assert q3.awaitTermination(180)
    assert spark.read.parquet(out_dir).count() == n_after_resume

    cols = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    emitted = _rows(spark.read.parquet(out_dir), cols)
    # exactly-once: no window emitted twice (dupes would mean a
    # replayed batch re-committed to the sink)
    assert len(emitted) == len({t[:3] for t in emitted})
    batch = tumbling_counts(events)
    batch_map = {t[:3]: t for t in _rows(batch, cols)}
    for t in emitted:             # every emitted row bit-equal to batch
        assert batch_map[t[:3]] == t
    # completeness: all strictly-closed windows made it out (boundary
    # window at exactly the watermark may go either way — q68's
    # documented eviction-boundary discipline)
    max_ts = events.agg(F.max("ts")).first()[0]
    import datetime
    wm = max_ts - datetime.timedelta(minutes=1)
    expected_closed = {k for k, t in batch_map.items()
                       if t[1] < wm}
    assert expected_closed <= {t[:3] for t in emitted}


def test_idempotent_batch_sink_stateful_crash_resume(spark, events,
                                                     tmp_path):
    """r5: exactly-once for UPDATE-mode stateful output — the case the
    built-in file sink cannot express. running_totals
    (applyInPandasWithState) streams through the idempotent
    foreachBatch sink (per-batch-dir overwrite); the query is killed
    mid-replay, resumed from the checkpoint, then resumed once more
    (strict no-op). Per-key CURRENT state (row at max __batch_id) must
    equal the batch aggregate, and no batch directory may hold
    duplicate keys (a replayed epoch overwrites, never appends)."""
    import time as _time

    from bigdata_spark_assignment_spark.streaming import (
        run_idempotent_batch_sink,
    )
    from bigdata_spark_assignment_spark.streaming.stateful import (
        running_totals,
    )

    stream = replay_as_stream(spark, events, n_chunks=12,
                              dir_path=str(tmp_path / "replay"))
    agg = running_totals(stream)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # phase 1: unbounded run, kill after >=2 committed batches
    def write_batch(df, batch_id):
        (df.withColumn("__batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .parquet(f"{out_dir}/batch={batch_id}"))

    q = (agg.writeStream.foreachBatch(write_batch)
         .outputMode("update").option("checkpointLocation", ck).start())
    deadline = _time.time() + 120
    while _time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["batchId"] >= 2:
            break
        _time.sleep(0.1)
    q.stop()
    q.awaitTermination(60)

    # phase 2 + 3: bounded resumes from the same checkpoint
    run_idempotent_batch_sink(agg, out_dir, ck)
    n_after = spark.read.parquet(out_dir).count()
    run_idempotent_batch_sink(agg, out_dir, ck)      # strict no-op
    assert spark.read.parquet(out_dir).count() == n_after

    rows = spark.read.option("basePath", out_dir).parquet(out_dir) \
        .collect()
    # no duplicate (key, batch) emissions — overwrite semantics held
    seen = [(r.user_id, r["__batch_id"]) for r in rows]
    assert len(seen) == len(set(seen))
    # current state per key == batch aggregate
    final = {}
    for r in rows:
        cur = final.get(r.user_id)
        if cur is None or r["__batch_id"] > cur[0]:
            final[r.user_id] = (r["__batch_id"], r.n_events, r.sum_value)
    batch = {r.user_id: (r.n_events, r.sum_value)
             for r in running_totals(events).collect()}
    assert set(final) == set(batch)
    for k, (_, n, s) in final.items():
        assert n == batch[k][0], k
        assert abs(s - batch[k][1]) < 1e-6, k


def test_mg_heavy_hitters_stream_batch_equivalence(spark, events, tmp_path):
    """Streaming MG with capacity above the item domain: every count
    is exact, so the last per-item emission equals the batch count
    table integer-for-integer."""
    from bigdata_spark_assignment_spark.streaming.stateful import (
        mg_heavy_hitters,
    )

    item = F.concat(F.col("event_type"), F.lit(":"),
                    F.pmod(F.col("user_id"), F.lit(10)).cast("string"))
    stream = replay_as_stream(spark, events, n_chunks=5,
                              dir_path=str(tmp_path))
    out = run_to_memory_sink(
        mg_heavy_hitters(stream, item, capacity=512, n_buckets=4),
        "t_mg", output_mode="update")
    final = {}
    for r in out.collect():      # counts monotone -> last = max
        if r.item not in final or r.mg_count > final[r.item]:
            final[r.item] = r.mg_count
    batch = {r.item: r.mg_count
             for r in mg_heavy_hitters(events, item).collect()}
    assert final == batch and len(batch) > 10


def test_mg_heavy_hitters_decrement_path(spark, tmp_path):
    """Capacity BELOW the domain: the decrement branch runs, and the
    MG guarantee holds — every item with true count > n/ (capacity+1)
    survives, and no estimate exceeds its true count."""
    from bigdata_spark_assignment_spark.streaming.stateful import (
        mg_heavy_hitters,
    )

    rows = ([("hh", i) for i in range(60)]
            + [(f"rare{i}", i) for i in range(30)])
    df = (spark.createDataFrame(rows, "event_type string, user_id long")
          .withColumn("ts", F.timestamp_seconds(F.col("user_id") + 1)))
    stream = replay_as_stream(spark, df, n_chunks=3,
                              dir_path=str(tmp_path))
    out = run_to_memory_sink(
        mg_heavy_hitters(stream, F.col("event_type"), capacity=4,
                         n_buckets=1),
        "t_mg_dec", output_mode="update")
    final = {}
    for r in out.collect():
        final[r.item] = r.mg_count          # last emission wins
    # the heavy item must survive with a lower-bounded estimate
    n = len(rows)
    assert "hh" in final
    assert 60 - n // 5 <= final["hh"] <= 60
    # summary stayed bounded
    last_size = out.count() and len(final)
    assert last_size <= 4 + 30  # evicted items may linger from earlier emissions
