"""Frequent-itemset / association-rule mining (operators/mining.py).

Hand-computable micro-baskets pin support/confidence/lift exactly;
the mega-basket cap and Apriori prune are exercised directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.operators.mining import (
    association_rules,
    basket_items,
    frequent_items,
    frequent_pairs,
)


@pytest.fixture(scope="module")
def baskets_df(spark):
    # 5 baskets over items a/b/c/d; duplicates inside basket 1 must
    # not double-count presence
    rows = [
        (1, "a"), (1, "b"), (1, "a"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "c"),
        (4, "a"), (4, "c"),
        (5, "d"),
    ]
    return spark.createDataFrame(rows, ["order_id", "item_name"])


def test_basket_items_dedupes(baskets_df):
    b = basket_items(baskets_df, "order_id", "item_name")
    assert b.count() == 10  # the duplicate (1, a) collapsed
    assert b.filter((F.col("basket") == 1) & (F.col("item") == "a")) \
            .count() == 1


def test_frequent_items_and_pairs_exact(baskets_df):
    b = basket_items(baskets_df, "order_id", "item_name")
    items = {r["item"]: r["item_count"]
             for r in frequent_items(b, 2).collect()}
    assert items == {"a": 4, "b": 3, "c": 2}  # d (1) filtered
    pairs = {(r["item_a"], r["item_b"]): r["pair_count"]
             for r in frequent_pairs(b, 2).collect()}
    assert pairs == {("a", "b"): 3, ("a", "c"): 2}  # (b,c)=1 filtered


def test_association_rules_metrics_exact(baskets_df):
    rules = {(r["antecedent"], r["consequent"]):
             (r["pair_count"], r["support"], r["confidence"], r["lift"])
             for r in association_rules(
                 baskets_df, "order_id", "item_name",
                 min_support=0.4, min_confidence=0.0).collect()}
    # n_baskets=5, threshold=ceil(0.4*5)=2: pairs (a,b)=3, (a,c)=2
    assert set(rules) == {("a", "b"), ("b", "a"),
                          ("a", "c"), ("c", "a")}
    pc, supp, conf, lift = rules[("a", "b")]
    assert (pc, supp) == (3, 3 / 5)
    assert conf == pytest.approx(3 / 4)          # P(b|a) = 3/4
    assert lift == pytest.approx(3 * 5 / (4 * 3))
    pc, supp, conf, lift = rules[("b", "a")]
    assert conf == pytest.approx(1.0)            # b always with a
    assert lift == pytest.approx(3 * 5 / (3 * 4))


def test_min_confidence_filters(baskets_df):
    rules = association_rules(baskets_df, "order_id", "item_name",
                              min_support=0.4, min_confidence=0.9)
    got = {(r["antecedent"], r["consequent"]) for r in rules.collect()}
    assert got == {("b", "a"), ("c", "a")}  # only the conf=1.0 rules


def test_mega_basket_cap_drops_whole_basket(spark):
    rows = [(1, f"i{k}") for k in range(10)] + [(2, "i0"), (2, "i1")]
    df = spark.createDataFrame(rows, ["b", "i"])
    b = basket_items(df, "b", "i")
    capped = frequent_pairs(b, 1, max_basket_items=5)
    # basket 1 (10 items) dropped entirely; only basket 2's pair left
    assert {(r["item_a"], r["item_b"], r["pair_count"])
            for r in capped.collect()} == {("i0", "i1", 1)}


def test_apriori_prune_is_broadcast_semi_join(baskets_df):
    b = basket_items(baskets_df, "order_id", "item_name")
    plan = frequent_pairs(b, 2)._jdf.queryExecution().executedPlan() \
                               .toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
