"""Z-order (Morton-curve) clustered file layout for multi-column
data skipping.

The 100 TB problem this solves: a table laid out in ingest order (or
sorted on ONE column) can only min/max-prune parquet files on that one
column. Real query mixes filter on several — events by (user_id AND
time window), lineitem by (orderkey AND partkey). Sorting on the
leading column destroys locality on the others; Z-ordering interleaves
the bits of all clustering columns so every file covers a small
HYPERCUBE of the key space, and a range predicate on ANY clustered
column (or any conjunction of them) overlaps only the files whose cube
intersects the query box. This is the layout strategy behind
Delta/Databricks OPTIMIZE ZORDER BY and Iceberg's sort-order z-curves;
implemented here from the public Morton-code construction.

No reference precedent: the reference engine
(/root/reference/src/main/scala/Main.scala) has a single CSV input and
no layout control; this is extension surface for the
lakehouse-at-scale story (SURVEY §2.10 sinks).

Plan shape (all JVM-side, no Python rows):

1. one global min/max aggregate per clustering column (a 5-number
   1-row frame, broadcast back via the 1-row crossJoin pattern);
2. each column normalized to a ``bits``-wide integer rank;
3. bit interleave as a fold of shift/AND/OR column expressions —
   Catalyst constant-folds the structure and whole-stage-codegens the
   arithmetic; no UDF;
4. ``repartitionByRange`` on the z-value (range exchange: one shuffle,
   contiguous curve segments per output file — this is what makes the
   per-file min/max tight) + ``sortWithinPartitions`` so row groups
   WITHIN a file are also curve-contiguous.

At 100 TB the only scale-bearing step is the range exchange, which is
the same shuffle any global sort pays; AQE coalesces the sampled
ranges. The min/max pre-pass is a column-pruned scan (cheap), and for
append-only ingest the bounds can be frozen once and reused so late
files stay curve-aligned with old ones.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits(col: Column, bits: int, stride: int, offset: int) -> Column:
    """Place bit i of ``col`` at position ``i * stride + offset`` —
    the general-d Morton spread as a fold of shift/AND/OR expressions."""
    parts = []
    for i in range(bits):
        bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
        parts.append(F.shiftleft(bit, i * stride + offset))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key(cols: list[Column], mins: list[Column], maxs: list[Column],
               bits: int = 16) -> Column:
    """Morton z-value for ``cols`` given per-column global bounds.

    Each column is normalized to ``[0, 2^bits)`` by linear scaling over
    its [min, max] range (degenerate min==max ranks to 0), cast to
    long, then bit-interleaved. Supports any column count d with
    d * bits <= 63.
    """
    d = len(cols)
    if d < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits overflows a long")
    top = (1 << bits) - 1
    spreads = []
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        span = hi.cast("double") - lo.cast("double")
        rank = F.when(span <= 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(top),
                F.floor((c.cast("double") - lo.cast("double"))
                        / span * (top + 1)).cast("long")))
        spreads.append(_spread_bits(rank, bits, d, j))
    return reduce(lambda a, b: a.bitwiseOR(b), spreads)


def zorder_key_py(vals: list[int], bounds: list[tuple[float, float]],
                  bits: int = 16) -> int:
    """Pure-Python reference of ``zorder_key`` for tests."""
    d = len(vals)
    top = (1 << bits) - 1
    z = 0
    for j, (v, (lo, hi)) in enumerate(zip(vals, bounds)):
        span = float(hi) - float(lo)
        rank = 0 if span <= 0 else min(
            top, int((float(v) - float(lo)) / span * (top + 1)))
        for i in range(bits):
            z |= ((rank >> i) & 1) << (i * d + j)
    return z


def write_zordered(df: DataFrame, cols: list[str], path: str,
                   n_files: int, bits: int = 16) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    z-curve of ``cols``. Numeric and timestamp columns are supported
    (timestamps cluster on their epoch seconds)."""
    def numeric(name: str) -> Column:
        c = F.col(name)
        dt = df.schema[name].dataType.simpleString()
        # TIMESTAMP_NTZ has no direct numeric cast in Spark 4; the
        # session is pinned UTC so the tz-cast is value-preserving
        return c.cast("timestamp").cast("long").cast("double") \
            if dt.startswith("timestamp") else c.cast("double")

    ncols = [numeric(c) for c in cols]
    stats = df.agg(*[F.min(c).alias(f"__lo{j}")
                     for j, c in enumerate(ncols)],
                   *[F.max(c).alias(f"__hi{j}")
                     for j, c in enumerate(ncols)])
    z = zorder_key(ncols,
                   [F.col(f"__lo{j}") for j in range(len(cols))],
                   [F.col(f"__hi{j}") for j in range(len(cols))],
                   bits=bits)
    (df.crossJoin(F.broadcast(stats))          # 1-row global-bounds attach
       .withColumn("__z", z)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z", *[f"__lo{j}" for j in range(len(cols))],
             *[f"__hi{j}" for j in range(len(cols))])
       .write.mode("overwrite").parquet(path))


def file_skip_stats(path: str, box: dict[str, tuple]) -> tuple[int, int]:
    """(n_files, n_files_overlapping_box) from parquet footer min/max
    statistics — the exact information a scan's file-level skipping
    uses, read driver-side via pyarrow (footers only, no row data)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    n_hit = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name not in box or col.statistics is None:
                    continue
                st = col.statistics
                if not st.has_min_max:
                    continue
                lo[name] = st.min if name not in lo else min(
                    lo[name], st.min)
                hi[name] = st.max if name not in hi else max(
                    hi[name], st.max)
        overlap = all(
            name in lo and not (hi[name] < qlo or lo[name] > qhi)
            for name, (qlo, qhi) in box.items())
        if overlap:
            n_hit += 1
    return len(files), n_hit


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort: bool = True) -> None:
    """Hash-bucketed table layout (``bucketBy`` + ``sortBy``) — the
    shuffle-free co-located join: two tables bucketed on the same key
    with the same bucket count join WITHOUT an Exchange on either
    side, because every bucket i of A can only match bucket i of B
    (Spark's Hive-style bucketing; the pre-shuffled layout Delta/
    Iceberg expose as bucket transforms).

    The 100 TB case: a fact table joined repeatedly on the same key
    (orders ⋈ lineitem on orderkey, events ⋈ users on user_id) pays
    its shuffle ONCE at write time; every subsequent join reads
    co-located buckets and skips the exchange entirely — the single
    biggest repeated-shuffle eliminator in a warehouse workload.
    ``sortBy`` additionally pre-sorts within buckets so the
    SortMergeJoin's per-task sort disappears too.

    Bucketed writes go through the session catalog (``saveAsTable`` —
    bucket metadata lives in the metastore, not the parquet footers),
    so this is a TABLE operator, not a path operator; plan-shape
    evidence in tests/test_layout.py (no Exchange under the join for
    the bucketed pair, Exchange present for the plain-parquet pair).
    """
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(n_buckets, bucket_col))
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
