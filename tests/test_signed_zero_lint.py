"""Tier-0 representation-identity lint: signed zero.

The r6-r8 ``q07_correlation`` driver red was a single IEEE -0.0: DuckDB's
``ROUND`` preserves the sign of zero (a tiny negative covariance rounds
to -0.0) while Spark's ``F.round`` goes through BigDecimal (no signed
zero) and lands on +0.0. Python ``==`` — the old driver-sim comparator —
treats ``-0.0 == 0.0`` as equal, but the driver's value hash serializes
the float and distinguishes them, so the failure was invisible to every
local harness for three rounds.

Guards, in order:
 1. mechanics of ``registry._plus_zero`` (the registration-time
    normalizer every oracle passes through),
 2. the regression pin — the raw q07 generator still *exhibits* the
    -0.0 at sf0.01 (so this lint is testing the real class, not a
    placebo) while the registered oracle does not,
 3. a full sweep: every registered oracle, run under DuckDB at sf0.001
    and sf0.01, must emit zero -0.0 cells,
 4. engine side — ``fround`` emits +0.0 for negatives that round to
    zero,
 5. a tripwire that the driver-sim comparator stays hash-faithful
    (repr-level float normalization, which keeps the -0.0/+0.0
    distinction tuple-`==` erases).
"""
import math
import os

import duckdb
import pytest

from bigdata_spark_assignment_spark.plans.registry import _plus_zero

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _neg_zero_cells(rows) -> int:
    return sum(1 for r in rows for v in r
               if isinstance(v, float) and v == 0.0
               and math.copysign(1.0, v) < 0)


class TestPlusZeroMechanics:
    def test_simple(self):
        assert _plus_zero("SELECT ROUND(x, 4) FROM t") == \
            "SELECT (ROUND(x, 4) + 0.0) FROM t"

    def test_nested_rounds_both_normalized(self):
        out = _plus_zero("ROUND(SUM(ROUND(x)), 2)")
        assert out == "(ROUND(SUM((ROUND(x) + 0.0)), 2) + 0.0)"

    def test_case_insensitive(self):
        assert _plus_zero("round(x, 4)") == "(round(x, 4) + 0.0)"

    def test_word_boundary_not_rewritten(self):
        # an identifier merely ending in "round" must not match
        assert _plus_zero("my_round(x)") == "my_round(x)"
        assert _plus_zero("AROUND(x)") == "AROUND(x)"

    def test_comment_skipped(self):
        sql = "SELECT x -- ROUND(x, 4) diverges (see note\nFROM t"
        assert _plus_zero(sql) == sql

    def test_string_literal_skipped(self):
        sql = "SELECT 'ROUND(x, 4)' AS lbl, ROUND(y, 2) FROM t"
        assert _plus_zero(sql) == \
            "SELECT 'ROUND(x, 4)' AS lbl, (ROUND(y, 2) + 0.0) FROM t"

    def test_nested_parens_balanced(self):
        out = _plus_zero("ROUND((a - b) / (c + d), 6)")
        assert out == "(ROUND((a - b) / (c + d), 6) + 0.0)"

    def test_quoted_identifier_skipped(self):
        # r9 ADVICE: a "-delimited identifier containing round( must
        # not be rewritten into invalid SQL
        sql = 'SELECT "round(x" FROM t'
        assert _plus_zero(sql) == sql
        sql2 = 'SELECT "ROUND(a)", ROUND(y, 2) FROM t'
        assert _plus_zero(sql2) == \
            'SELECT "ROUND(a)", (ROUND(y, 2) + 0.0) FROM t'

    def test_length_changing_casefold_does_not_desync(self):
        # r9 ADVICE: 'ß'.upper() == 'SS' — a whole-string .upper()
        # shifts every later position by one and the old scanner
        # would misplace the rewrite after such a char
        sql = "SELECT 'ß', ROUND(y, 2) FROM t"
        assert _plus_zero(sql) == \
            "SELECT 'ß', (ROUND(y, 2) + 0.0) FROM t"

    def test_duckdb_equivalence_and_sign(self):
        con = duckdb.connect()
        raw = "SELECT ROUND(CAST(-0.00003 AS DOUBLE), 4) AS v"
        assert con.execute(raw).fetchone()[0] == 0.0
        assert math.copysign(1.0, con.execute(raw).fetchone()[0]) < 0
        v = con.execute(_plus_zero(raw)).fetchone()[0]
        assert v == 0.0 and math.copysign(1.0, v) > 0
        # non-zero values are bit-identical under the rewrite
        for lit in ("1.2345678", "-9.87e-3", "0.00005", "-0.00005"):
            q = f"SELECT ROUND(CAST({lit} AS DOUBLE), 4)"
            a = con.execute(q).fetchone()[0]
            b = con.execute(_plus_zero(q)).fetchone()[0]
            assert a == b and math.copysign(1.0, a) == math.copysign(1.0, b)

    def test_null_passthrough(self):
        con = duckdb.connect()
        assert con.execute(_plus_zero(
            "SELECT ROUND(CAST(NULL AS DOUBLE), 4)")).fetchone()[0] is None


@pytest.mark.skipif(not os.path.isdir("/root/testdata/sf0.01"),
                    reason="driver testdata not present")
class TestSignedZeroRegression:
    def test_raw_q07_exhibits_the_class(self):
        """The un-normalized generator must still show the -0.0 at
        sf0.01 — proof this lint exercises the real failure, and a
        canary that the data/semantics underneath haven't drifted."""
        from bigdata_spark_assignment_spark.plans.relational import \
            _q07_oracle
        rows = _con("/root/testdata/sf0.01").execute(
            _q07_oracle()).fetchall()
        assert _neg_zero_cells(rows) == 1  # cmat l_discount~l_tax m1

    def test_registered_q07_is_clean(self):
        import __spark_entry__ as mod
        rows = _con("/root/testdata/sf0.01").execute(
            mod.oracle_sql()["q07_correlation"]).fetchall()
        assert _neg_zero_cells(rows) == 0

    # r12: the sf0.01 sweep re-executes every oracle in DuckDB (~35s);
    # the -0.0 class fires identically at sf0.001 — keep the cheap
    # scale in the default gate, the big one under -m slow
    @pytest.mark.parametrize("sf", [
        "sf0.001",
        pytest.param("sf0.01", marks=pytest.mark.slow)])
    def test_no_negative_zero_in_any_registered_oracle(self, sf):
        import __spark_entry__ as mod
        con = _con(f"/root/testdata/{sf}")
        dirty = []
        for name, sql in mod.oracle_sql().items():
            if _neg_zero_cells(con.execute(sql).fetchall()):
                dirty.append(name)
        assert dirty == []

    def test_every_round_site_is_normalized(self):
        """Static check: in every registered oracle, each ROUND( outside
        comments/strings sits inside its "(... + 0.0)" wrapper."""
        import __spark_entry__ as mod

        def unwrapped_sites(sql: str) -> int:
            # mirrors registry._plus_zero's scanner: slice-level
            # case folding (whole-string .upper() can change LENGTH —
            # 'ß'→'SS' — and desync positions, r9 ADVICE) and
            # "-quoted identifier skipping
            n, i, bad = len(sql), 0, 0
            while i < n:
                if sql[i] == "-" and sql[i:i + 2] == "--":
                    j = sql.find("\n", i)
                    i = n if j < 0 else j
                    continue
                if sql[i] in ("'", '"'):
                    q, j = sql[i], i + 1
                    while j < n and sql[j] != q:
                        j += 1
                    i = j + 1
                    continue
                if (sql[i:i + 6].upper() == "ROUND("
                        and (i == 0 or not (sql[i - 1].isalnum()
                                            or sql[i - 1] == "_"))):
                    depth, j = 1, i + 6
                    while j < n and depth:
                        if sql[j] == "(":
                            depth += 1
                        elif sql[j] == ")":
                            depth -= 1
                        j += 1
                    wrapped = (i > 0 and sql[i - 1] == "("
                               and sql[j:j + 7] == " + 0.0)")
                    if not wrapped:
                        bad += 1
                    i += 6  # keep scanning inside (nested ROUNDs)
                    continue
                i += 1
            return bad

        for name, sql in mod.oracle_sql().items():
            assert unwrapped_sites(sql) == 0, \
                f"{name}: un-normalized ROUND site survived registration"


def test_fround_normalizes_signed_zero(spark):
    from pyspark.sql import functions as F

    from bigdata_spark_assignment_spark.plans.registry import fround
    row = (spark.range(1)
           .select(fround(F.lit(-0.00003)).alias("z"),
                   fround(F.lit(-1.23456789)).alias("nz"),
                   fround(F.lit(0.00003)).alias("pz")).first())
    assert row.z == 0.0 and math.copysign(1.0, row.z) > 0
    assert row.nz == -1.2346
    assert row.pz == 0.0 and math.copysign(1.0, row.pz) > 0


def test_driver_sim_comparator_is_hash_faithful():
    """Tripwire: the sim's norm() must keep the -0.0/+0.0 distinction
    (repr-level), since the driver's value hash does. Source-level check
    because driver_sim executes a full Spark run at import."""
    src = open(os.path.join(os.path.dirname(__file__),
                            "driver_sim.py")).read()
    assert "repr(round(v, 6))" in src
    # and the invariant that repr-normalization actually separates them
    assert repr(round(-0.0, 6)) != repr(round(0.0, 6))
    assert repr(round(-1e-9, 6)) == "-0.0"
    # the pytest-side comparator (oracle_utils) must hold the same line
    from tests.oracle_utils import _norm_val
    assert _norm_val(-0.0) != _norm_val(0.0)
    assert _norm_val(-1e-9) == "-0.0" and _norm_val(1e-9) == "0.0"


def test_plus_zero_value_identity_property():
    """Property: for any double x and scale k, the normalized oracle
    ROUND equals the raw one on VALUE for every input, and on SIGN for
    every input except a zero result, which must come out +0.0."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(x=st.floats(allow_nan=False, allow_infinity=False,
                       width=64),
           k=st.integers(min_value=0, max_value=8))
    def check(x, k):
        q = f"SELECT ROUND(CAST({x!r} AS DOUBLE), {k})"
        a = con.execute(q).fetchone()[0]
        b = con.execute(_plus_zero(q)).fetchone()[0]
        assert a == b  # value identity (== treats ±0.0 equal — next line)
        if b == 0.0:
            assert math.copysign(1.0, b) > 0  # normalized zero
        else:
            assert math.copysign(1.0, a) == math.copysign(1.0, b)

    check()
