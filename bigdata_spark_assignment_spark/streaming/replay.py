"""Replay a static table as a file stream + drive a stream to a sink.

The driver's ``events`` parquet is batch data; to exercise the real
streaming engine (state store, watermarks, incremental triggers) we
re-write it as N chunk files in event-time order and read the
directory with ``readStream`` + ``maxFilesPerTrigger=1`` — each
micro-batch then observes a time-ordered slice, which is what makes
watermark/late-data behavior meaningful in tests.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def replay_as_stream(spark: SparkSession, df: DataFrame,
                     order_col: str = "ts", n_chunks: int = 8,
                     dir_path: str | None = None,
                     files_per_trigger: int = 1) -> DataFrame:
    """Materialize ``df`` as ``n_chunks`` files in ``order_col`` order
    and open them as a file-source stream (one file per micro-batch by
    default)."""
    dir_path = dir_path or tempfile.mkdtemp(prefix="spark_replay_")
    data_dir = os.path.join(dir_path, "data")
    # Watermarks demand TIMESTAMP (with zone); driver parquet carries
    # TIMESTAMP_NTZ. Session TZ is pinned UTC (session.py), so the cast
    # is value-preserving — done once here at replay-write time.
    ntz_cols = [f.name for f in df.schema.fields
                if f.dataType.simpleString() == "timestamp_ntz"]
    out = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    # one file per range-partition => files are time-ordered chunks
    (out.repartitionByRange(n_chunks, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite").parquet(data_dir))
    # FileStreamSource orders files by MODIFICATION time, but one write
    # job stamps every part file at once — chunks could replay out of
    # event-time order, advancing the watermark past earlier chunks.
    # part-0000i == i-th range partition, so restamp mtimes to match.
    import glob
    import time as _time
    base = _time.time()
    for i, path in enumerate(sorted(glob.glob(
            os.path.join(data_dir, "part-*.parquet")))):
        os.utime(path, times=(base + i, base + i))
    return (spark.readStream
            .schema(out.schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(data_dir))


def replay_with_late_chunk(spark: SparkSession, df: DataFrame,
                           late_df: DataFrame, order_col: str = "ts",
                           n_chunks: int = 6,
                           dir_path: str | None = None,
                           files_per_trigger: int = 1) -> DataFrame:
    """Like ``replay_as_stream`` (which it delegates to), plus ONE
    extra chunk file of ``late_df`` rows stamped to replay LAST —
    after the watermark has advanced past their event times.
    Deterministic late-data fixture: chunk order is pinned by mtime,
    so the watermark at the late batch is exactly max(event time of
    the on-time chunks) − delay. The file source lists files at query
    START, so the late file written here is part of the replay for
    any query started on the returned stream.
    """
    import glob
    import shutil

    dir_path = dir_path or tempfile.mkdtemp(prefix="spark_replay_late_")
    stream = replay_as_stream(spark, df, order_col=order_col,
                              n_chunks=n_chunks, dir_path=dir_path,
                              files_per_trigger=files_per_trigger)
    data_dir = os.path.join(dir_path, "data")
    ntz_cols = [f.name for f in late_df.schema.fields
                if f.dataType.simpleString() == "timestamp_ntz"]
    late = late_df.withColumns(
        {c: F.col(c).cast("timestamp") for c in ntz_cols})
    staging = os.path.join(dir_path, "late_staging")
    late.coalesce(1).write.mode("overwrite").parquet(staging)
    staged = glob.glob(os.path.join(staging, "part-*.parquet"))
    if not staged:
        # empty late_df wrote no part file — a zero-late replay is just
        # replay_as_stream, not an IndexError (ADVICE r4)
        shutil.rmtree(staging, ignore_errors=True)
        return stream
    dest = os.path.join(data_dir, "part-late.parquet")
    os.rename(staged[0], dest)
    shutil.rmtree(staging, ignore_errors=True)
    on_time = [p for p in glob.glob(os.path.join(data_dir, "part-*.parquet"))
               if p != dest]
    if not on_time:
        raise ValueError(
            "replay_with_late_chunk needs at least one on-time chunk file; "
            "df wrote no part files")
    last = max(os.path.getmtime(p) for p in on_time)
    os.utime(dest, times=(last + 10, last + 10))
    return stream


def run_to_memory_sink(stream_df: DataFrame, name: str,
                       output_mode: str = "append",
                       timeout_s: int = 120) -> DataFrame:
    """Run a streaming query to completion (availableNow trigger) into
    an in-memory table and return it as a DataFrame. Test harness only
    — memory sinks collect to the driver; production sinks are
    kafka/parquet/delta via ``writeStream``."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    # availableNow is a BOUNDED drain — it always terminates — but on
    # a degraded host window it can exceed the soft timeout, and
    # returning early hands the caller a PARTIAL sink (r12: a
    # stream-stream-join equivalence test read an empty table under
    # host load). Wait out the soft timeout, then keep waiting up to a
    # hard cap before failing loudly instead of silently truncating.
    if not q.awaitTermination(timeout_s):
        if not q.awaitTermination(timeout_s * 4):
            q.stop()
            raise TimeoutError(
                f"memory-sink drain {name!r} still running after "
                f"{timeout_s * 5}s — aborted (partial results would "
                f"be silently wrong)")
    spark = stream_df.sparkSession
    return spark.table(name)


def run_idempotent_batch_sink(stream_df: DataFrame, out_dir: str,
                              checkpoint_dir: str,
                              output_mode: str = "update",
                              timeout_s: int = 180):
    """``foreachBatch`` parquet sink with per-batch-directory OVERWRITE
    — the standard exactly-once recipe for output modes the built-in
    file sink cannot express (update/complete from stateful
    operators).

    Why this is exactly-once: after a crash, Structured Streaming
    re-runs the last uncommitted epoch with the SAME ``batch_id``; the
    writer targets ``{out}/batch=<id>`` with ``mode=overwrite``, so a
    replayed epoch replaces its own partial output instead of
    appending a duplicate. Downstream readers see each epoch exactly
    once; for update-mode per-key output the CURRENT state is the row
    with the max batch id per key (batch id rides as a column).

    100 TB notes: this is the pattern production jobs use for
    lakehouse upserts when the sink lacks transactions — idempotence
    comes from keying the write by epoch, not from the store. Runs a
    BOUNDED drain (availableNow) so checkpointed restarts compose.
    Returns the finished StreamingQuery (await already done).
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        (df.withColumn("__batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch={batch_id}")))

    q = (stream_df.writeStream
         .foreachBatch(write_batch)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    # same slow-host guard as run_to_memory_sink: soft timeout, then a
    # hard cap — this one already failed loudly, now it waits longer
    # before doing so
    if not q.awaitTermination(timeout_s):
        if not q.awaitTermination(timeout_s * 4):
            q.stop()
            raise TimeoutError(
                "idempotent batch sink drain did not finish "
                f"within {timeout_s * 5}s")
    return q
