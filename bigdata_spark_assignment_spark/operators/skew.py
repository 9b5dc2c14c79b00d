"""Skew-mitigation helpers (SURVEY.md §4.3 — 100 TB design).

AQE's skew-join splitting (on by default in session.py) handles
moderate skew at runtime; these helpers are for the pathological case
a static plan must survive — a handful of hot keys holding a large
fraction of a 100 TB fact table, where one shuffle partition would
otherwise receive the whole hot key.

``salted_join``: fact rows get a uniform salt in [0, salt); the dim
side is replicated once per salt value, so the join key becomes
(key, salt) and each hot key fans out over ``salt`` partitions. Cost:
dim side × salt (keep dim small — if it broadcasts, you don't need
salting at all, use ``F.broadcast``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int, col_name: str = "__salt",
              seed: int = 42) -> DataFrame:
    """Uniform salt column in [0, salt). ``rand`` is seeded for test
    reproducibility; salting only needs uniformity, not determinism."""
    return df.withColumn(col_name, (F.rand(seed) * salt).cast("int"))


def replicate_per_salt(df: DataFrame, salt: int,
                       col_name: str = "__salt") -> DataFrame:
    """Cross the (small) side with salt values 0..salt-1 — one replica
    per salt bucket, via explode (no driver round-trip)."""
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))


def salted_join(fact: DataFrame, dim: DataFrame, on: list[str] | str,
                salt: int = 8, how: str = "inner",
                hot_keys: DataFrame | None = None) -> DataFrame:
    """Equi-join with the fact side salted against hot-key skew.

    Result is row-identical to ``fact.join(dim, on, how)`` (asserted in
    tests); only the shuffle distribution changes: each (key, salt)
    pair forms its own partition, bounding any single task at
    ~|hot key| / salt rows.

    ``hot_keys`` (a DataFrame containing the join-key columns, e.g.
    the top rows of ``key_skew_stats``) switches on TARGETED salting —
    the 100 TB configuration: only rows whose key is in the hot list
    fan out / replicate; everything else keeps salt 0. Blanket salting
    replicates the ENTIRE dim ×salt (shuffle volume salt·|dim| — the
    sf1 record showed exactly that term dominating q50), targeted
    salting pays salt·|hot| with |hot| a handful of keys, plus one
    broadcast of the hot list to tag both sides. Measure with
    ``key_skew_stats`` first; feed its output straight in (it stays a
    DataFrame — no driver collect).

    Supported how: inner / left / left_outer (the dim replicas are
    identical, so fact-preserving joins stay exact; right/full would
    multiply unmatched dim rows by ``salt`` and are rejected).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if hot_keys is None:
        f = with_salt(fact, salt)
        d = replicate_per_salt(dim, salt)
        return f.join(d, keys + ["__salt"], how).drop("__salt")
    hk = F.broadcast(hot_keys.select(*keys).distinct()
                     .withColumn("__hot", F.lit(1)))
    f = (fact.join(hk, keys, "left")
         .withColumn("__salt",
                     F.when(F.col("__hot") == 1,
                            (F.rand(42) * salt).cast("int"))
                     .otherwise(F.lit(0)))
         .drop("__hot"))
    d = (dim.join(hk, keys, "left")
         .withColumn("__salt", F.explode(F.sequence(
             F.lit(0),
             F.when(F.col("__hot") == 1, F.lit(salt - 1))
             .otherwise(F.lit(0)))))
         .drop("__hot"))
    return f.join(d, keys + ["__salt"], how).drop("__salt")


def key_skew_stats(df: DataFrame, key_col: str, top_n: int = 3) -> DataFrame:
    """Skew DIAGNOSIS — the measurement that decides between a plain
    join, AQE skew splitting, and ``salted_join``: the ``top_n``
    hottest keys with their row counts and share of the table.
    Deterministic ordering (count desc, key asc) so the result is
    engine-independent and oracle-checkable.

    100 TB notes: one key-only aggregate (map-side partials collapse
    per-key before the shuffle) + a broadcast 1-row total; the top-n
    is a TakeOrdered, never a full sort. Run this BEFORE picking a
    join strategy — salting costs dim×salt replication and is only
    worth it when max share is large enough that one shuffle partition
    would otherwise hold a meaningful fraction of the table.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__t"))
    return (counts.crossJoin(F.broadcast(total))
            .select(key_col, "n_rows",
                    (F.col("n_rows") / F.col("__t")).alias("share"))
            .orderBy(F.col("n_rows").desc(), F.col(key_col))
            .limit(top_n))
