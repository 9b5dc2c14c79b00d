"""Rounding-grid-distance lint (VERDICT r7 #1c).

The r6/r7 driver q07 reds were rounded-double readouts sitting within
an ulp of a ROUND() half-grid boundary: any engine/host/thread-order
difference in the unrounded value flips the rounded digit and the
value hash, while every local rerun stays green. The r8 q07 rebuild
makes every leg a fixed double tree over exact integer statistics, so
the unrounded value is bit-identical across engines up to the single
documented LN/EXP ulp — but the structural guarantee still deserves a
measured one: this lint runs the UNROUNDED oracle
(``_q07_oracle(rounded=False)``) at all three driver scales and
asserts each readout sits at least ``MIN_DIST`` from its rounding
boundary, so a knife-edge readout fails AT PIN TIME, in pytest, not
two rounds later in the driver's environment.

DuckDB-thread invariance (test_oracle_float_stability) provably did
not catch the r6/r7 class; distance-from-grid is the property that
actually protects the hash.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from bigdata_spark_assignment_spark.io import TABLE_NAMES
from bigdata_spark_assignment_spark.plans.relational import (
    Q07_GRID_DECIMALS,
    _q07_oracle,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]

# Minimum distance (in original units) between an unrounded readout
# and the nearest ROUND half-grid boundary. The largest legitimate
# cross-engine wobble is the udaf leg's one LN/EXP ulp (~1e-11 of a
# ~4e4 readout); 1e-9 gives two orders of margin above it while being
# five orders below the 4-dp grid pitch.
MIN_DIST = 1e-9

_MEASURE_COLS = ("m1", "m2", "m3")


def _dist_from_grid(value: float, decimals: int) -> float:
    y = value * 10.0 ** decimals
    frac = y - math.floor(y)
    return abs(frac - 0.5) * 10.0 ** -decimals


@pytest.mark.parametrize("sf_dir", SFS)
def test_q07_readouts_sit_off_the_rounding_grid(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    rows = con.execute(_q07_oracle(rounded=False)).fetchall()
    assert len(rows) >= 21
    checked = 0
    offenders = []
    for r in rows:
        part = r[0]
        for i, col in enumerate(_MEASURE_COLS):
            k = Q07_GRID_DECIMALS.get((part, col))
            v = r[2 + i]
            if k is None or v is None or math.isnan(v):
                continue
            checked += 1
            d = _dist_from_grid(float(v), k)
            if d < MIN_DIST:
                offenders.append((part, r[1], col, v, d))
    assert checked >= 15, f"lint saw too few readouts ({checked})"
    assert not offenders, (
        f"{sf_dir}: readouts within {MIN_DIST} of their rounding grid "
        f"boundary — a 1-ulp engine difference could flip the driver "
        f"hash; quantize coarser or restructure the leg: {offenders}")


def test_grid_metadata_covers_every_rounded_readout():
    """Every ROUND in the rounded oracle must have a decimals entry,
    so a new leg cannot silently skip the lint: compare the count of
    readout ROUNDs (rounded vs unrounded SQL difference) with the
    metadata size."""
    rounded = _q07_oracle(rounded=True)
    raw = _q07_oracle(rounded=False)
    n_readout_rounds = rounded.count("ROUND(") - raw.count("ROUND(")
    # cmat contributes 10 rows but its 2 ROUNDed columns are generated
    # from one (part, col) template pair per readout column; count
    # metadata entries as distinct ROUND call sites: corr 3, ols 3,
    # udaf 2, cmat 2 per pair x 10 pairs = 20, spearman 3, conformal 2.
    assert n_readout_rounds == 3 + 3 + 2 + 20 + 3 + 2
    assert set(Q07_GRID_DECIMALS) == {
        (p, m) for p in ("corr", "spearman") for m in _MEASURE_COLS
    } | {("ols", m) for m in _MEASURE_COLS} | {
        ("udaf", "m1"), ("udaf", "m2"),
        ("cmat", "m1"), ("cmat", "m2"),
        ("conformal", "m1"), ("conformal", "m2")}


@pytest.mark.parametrize("sf_dir", SFS)
def test_q54_percentile_readouts_sit_off_the_rounding_grid(sf_dir):
    """r8 session 2: the q54 tier-3 claim, MEASURED. The interpolated
    quartiles of integer cents land on the quarter-cent grid (always
    ≥ 5e-5 from a 4dp boundary), but the MAD leg's second
    interpolation lands on the 1/16-cent grid, whose k/1600-dollar
    points CAN coincide with a ROUND boundary in theory — so measure
    the actual distances at every driver scale instead of trusting
    the algebra. (Measured today: every readout sits exactly ON a
    4dp grid point — maximal distance.)"""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    rows = con.execute("""
    WITH liq AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
      FROM lineitem WHERE l_extendedprice IS NOT NULL),
    med AS (SELECT l_returnflag, quantile_cont(pc, 0.5) AS med
            FROM liq GROUP BY 1),
    dev AS (SELECT liq.l_returnflag, ABS(pc - med) AS d
            FROM liq JOIN med USING (l_returnflag)),
    mad AS (SELECT l_returnflag, quantile_cont(d, 0.5) AS mad
            FROM dev GROUP BY 1)
    SELECT b.p25 / 100, b.p50 / 100, b.p75 / 100, m.mad / 100
    FROM (SELECT l_returnflag,
                 quantile_cont(pc, 0.25) AS p25,
                 quantile_cont(pc, 0.50) AS p50,
                 quantile_cont(pc, 0.75) AS p75
          FROM liq GROUP BY 1) b
    JOIN mad m USING (l_returnflag)
    """).fetchall()
    assert len(rows) == 3
    offenders = [
        (i, v, _dist_from_grid(float(v), 4))
        for r in rows for i, v in enumerate(r)
        if v is not None and _dist_from_grid(float(v), 4) < 1e-6]
    assert not offenders, (
        f"{sf_dir}: q54 readouts within 1e-6 of the 4dp boundary "
        f"— quantize the MAD interpolation coarser: {offenders}")
