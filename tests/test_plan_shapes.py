"""Plan-shape regression tests: the physical plans the 100 TB story
depends on, pinned so a refactor that silently loses a pushdown, a
broadcast, or a bucket-equi-join shows up as a test failure — not as a
2× bench regression three rounds later.

explain("formatted") prints each node in the tree AND the detail
section, so node-name counts come in multiples of 2.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from bigdata_spark_assignment_spark.plans import REGISTRY


def _plan(spark, sf_oracle, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        REGISTRY[name].fn(spark, sf_oracle).explain("formatted")
    return buf.getvalue()


def test_filter_and_projection_reach_the_scan(spark, sf_oracle):
    p = _plan(spark, sf_oracle, "q02_filter_project_cast")
    assert "GreaterThan(o_totalprice,50000.0)" in p  # pushed predicate
    assert "Not(EqualTo(o_orderstatus,O))" in p
    # column pruning: the scan reads exactly the 4 referenced columns
    assert ("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,"
            "o_totalprice:double,o_orderdate:timestamp_ntz>") in p


def test_snowflake_dims_are_broadcast(spark, sf_oracle):
    p = _plan(spark, sf_oracle, "q04_join_broadcast_dims")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # dims must never shuffle the fact


def test_blocked_cosine_is_bucket_local(spark, sf_oracle):
    """The PAIR stage of q67 (before the semantic-dedup cluster parts,
    which are iterative and add their own exchanges) must stay a
    single bucket-hash Exchange feeding the vectorized Gram block."""
    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.similarity import (
        lsh_bucket_expr,
        neardup_pairs_cosine,
    )
    from bigdata_spark_assignment_spark.plans.similarity_plans import (
        _BLOCK_PLANES,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_oracle, "embeddings")
    blocked = emb.withColumn(
        "blk", lsh_bucket_expr(F.col("embedding"), _BLOCK_PLANES))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        neardup_pairs_cosine(blocked, threshold=0.4,
                             block_col="blk").explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "FlatMapGroupsInPandas" in p  # vectorized Gram block
    # exactly one Exchange (hash by bucket); ×2 for tree+detail listing
    assert p.count("Exchange") <= 4


def test_substring_windows_are_scan_local(spark, sf_oracle):
    """shared_window_stats must build windows inside the scan stage
    (Arrow per-doc hash UDF) — no Window operator, so no doc_id
    Exchange+sort before the (hash, doc) aggregate."""
    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.dedup import (
        shared_window_stats,
    )

    docs = load_table(spark, sf_oracle, "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        shared_window_stats(docs, window_tokens=10).explain("formatted")
    p = buf.getvalue()
    assert "ArrowEvalPython" in p  # the per-doc window-hash UDF
    assert "Window" not in p


def test_grouping_family_is_single_scan(spark, sf_oracle):
    """q20 computes rollup+cube+gsets from ONE lineitem scan (one
    Expand, no per-family union re-scan)."""
    p = _plan(spark, sf_oracle, "q20_rollup_cube_gsets")
    assert p.count("Scan parquet") <= 2  # tree + detail listing
    assert "Union" not in p


def test_topk_uses_take_ordered_not_full_sort(spark, sf_oracle):
    p = _plan(spark, sf_oracle, "q10_topk_orders")
    assert "TakeOrderedAndProject" in p


def test_returnflag_filter_pushed_through_joins(spark, sf_oracle):
    p = _plan(spark, sf_oracle, "q58_tpch_suite")
    assert "EqualTo(l_returnflag,R)" in p  # into the lineitem scan
    assert "BroadcastHashJoin" in p


# r12: builds all 56 plans (~54s); audit-grade plan lint (10x variant already slow) — slow set
@pytest.mark.slow
def test_no_cartesian_product_anywhere(spark, sf_oracle):
    """Scale-killer sweep: no registered query may plan a
    CartesianProduct (1-row scalar crossJoins broadcast; q40's bounded
    probe side broadcasts to a nested-loop, which is fine)."""
    offenders = []
    for name in REGISTRY:
        if name in ("q43_ml_suite", "q68_stream_replay_suite",
                    "q42_ann_methods_recall", "q69_csv_roundtrip_check",
                    "q11_split_sample_counts"):
            continue  # eager/estimator/stream queries: explain runs them
        try:
            if "CartesianProduct" in _plan(spark, sf_oracle, name):
                offenders.append(name)
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"{name} failed to plan: {e}")
    assert not offenders, offenders


# ---------------------------------------------------------------------------
# r5 (VERDICT r4 #7): the same plan shapes must SURVIVE 10x statistics.
# Runs against the sf1 build tools/scale_runs.py produces; skipped when
# that build is absent (CI runs `python tools/scale_runs.py sf1-full`
# or just build_sf1 first).
# ---------------------------------------------------------------------------

SF1_DIR = "/tmp/sparkgraft_sf1"


def _sf1_or_skip() -> str:
    import os
    if not os.path.isdir(os.path.join(SF1_DIR, "lineitem.parquet")):
        pytest.skip("sf1 build absent - run tools/scale_runs.py sf1 first")
    return SF1_DIR


@pytest.mark.parametrize("name,wanted,forbidden", [
    # dims stay broadcast at 10x: region/nation are fixed-size and
    # supplier/part grow 10x but remain far under the broadcast
    # threshold - a flip to SortMergeJoin here would shuffle the fact
    ("q04_join_broadcast_dims", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    # predicate + projection pushdown is statistics-independent
    ("q02_filter_project_cast",
     ["GreaterThan(o_totalprice,50000.0)"], []),
    # global top-k must stay TakeOrdered at any scale. Forbid GLOBAL
    # sorts only ("], true, 0" is the formatted-explain global-Sort
    # argument signature): the r5 gini/pareto legs legitimately added
    # LOCAL window partition sorts ("], false, 0"), identical at
    # sf0.1 and sf1 — the original blanket "Sort " pin predates them
    # (it was skip-masked until the sf1 build existed on this host).
    ("q10_topk_orders", ["TakeOrderedAndProject"], ["], true, 0"]),
    # the TPC-H suite keeps its pushed filter and at least one
    # broadcast dim at 10x
    ("q58_tpch_suite", ["EqualTo(l_returnflag,R)", "BroadcastHashJoin"],
     []),
])
def test_plan_shapes_survive_10x_stats(spark, name, wanted, forbidden):
    sf1 = _sf1_or_skip()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        REGISTRY[name].fn(spark, sf1).explain("formatted")
    p = buf.getvalue()
    for w in wanted:
        assert w in p, f"{name}@sf1 lost {w!r}"
    for f in forbidden:
        assert f not in p, f"{name}@sf1 gained {f!r}"


@pytest.mark.slow
def test_no_cartesian_product_at_10x(spark):
    """The scale-killer sweep repeated against 10x statistics — AQE /
    the planner must not flip any 1-row broadcast into a cartesian."""
    sf1 = _sf1_or_skip()
    offenders = []
    for name in REGISTRY:
        if name in ("q43_ml_suite", "q68_stream_replay_suite",
                    "q42_ann_methods_recall", "q69_csv_roundtrip_check",
                    "q11_split_sample_counts"):
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            REGISTRY[name].fn(spark, sf1).explain("formatted")
        if "CartesianProduct" in buf.getvalue():
            offenders.append(name)
    assert not offenders, offenders


def test_q17_decorrelation_prunes_before_window(spark, sf_oracle):
    """q58's q17 part: the correlated scalar aggregate must become ONE
    window whose exchange runs on the brand-PRUNED fact — the brand
    filter reaches the part scan, the partkey semi-join is broadcast,
    and the only fact shuffle is hashpartitioning(l_partkey)."""
    p = _plan(spark, sf_oracle, "q58_tpch_suite")
    assert "EqualTo(p_brand,Brand#13)" in p      # pushed into part scan
    assert "hashpartitioning(l_partkey" in p     # window exchange
    assert "CartesianProduct" not in p


def test_q18_aggregates_before_joining(spark, sf_oracle):
    """q58's q18 part: the HAVING aggregate runs BELOW the joins (only
    qualifying orderkeys reach them) and the dims broadcast — the
    pre-aggregation exchange on l_orderkey plus the post-agg sum_qty
    filter must both be present, with no sort-merge join anywhere in
    the suite at oracle scale."""
    p = _plan(spark, sf_oracle, "q58_tpch_suite")
    assert "hashpartitioning(l_orderkey" in p    # pre-agg exchange
    assert "sum_qty" in p and "> 300.0" in p     # HAVING after the agg
    assert "SortMergeJoin" not in p


def test_cms_build_partial_aggregates_before_exchange(spark, sf_oracle):
    """r5 session 3: the CMS build's defining property is that the
    exchange carries partial-aggregated (d, bucket) counts — ≤ d·w
    rows per task — never raw items; and point estimates broadcast
    the grid rather than shuffling query items."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.sketches import (
        cms_build,
        cms_point_estimates,
    )
    docs = load_table(spark, sf_oracle, "documents")
    toks = (docs.select(F.explode(F.split(F.lower("text"), "\\s+"))
                        .alias("token"))
            .filter(F.col("token") != ""))
    grid = cms_build(toks, "token")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        grid.explain("formatted")
    p = buf.getvalue()
    # partial agg (HashAggregate) BELOW the exchange, final above
    ex = p.index("Exchange (")
    assert "HashAggregate" in p[:ex] and "HashAggregate" in p[ex:]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cms_point_estimates(grid, toks.distinct(), "token") \
            .explain("formatted")
    q = buf.getvalue()
    assert "BroadcastHashJoin LeftOuter" in q
    assert "CartesianProduct" not in q


def test_fuzzy_and_prefix_joins_are_equi_joins(spark, sf_oracle):
    """r5 session 3: neither string-similarity join may degrade to a
    cartesian/nested-loop candidate stage — the fuzzy join must join
    on the variant hash, the prefix join on the (windowed) prefix
    shingle."""
    p = _plan(spark, sf_oracle, "q33_neardup_jaccard_bruteforce")
    assert "CartesianProduct" not in p
    assert "xxhash64" in p          # deletion-variant hash join key
    assert p.count("Window") >= 2   # prefix row_number per doc


def test_assoc_rules_apriori_prune_and_copartition(spark, sf_oracle):
    """r5 session 4 (q72 assoc): the Apriori item prune must be a
    broadcast LEFT-SEMI join BEFORE the pair self-join, and the pair
    self-join must be an equi-join on the basket key — never a
    cartesian/theta join."""
    from pyspark.sql import functions as F

    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.mining import (
        association_rules,
    )
    li = load_table(spark, sf_oracle, "lineitem")
    part = load_table(spark, sf_oracle, "part")
    branded = (li.select("l_orderkey", "l_partkey")
               .join(F.broadcast(part.select("p_partkey", "p_brand")),
                     F.col("l_partkey") == F.col("p_partkey")))
    rules = association_rules(branded, "l_orderkey", "p_brand",
                              min_support=0.02, min_confidence=0.15)
    p = rules._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p and "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bm25_only_query_postings_survive(spark, sf_oracle):
    """r5 session 4 (q61 bm25): the query-term table must broadcast
    into the postings join (term-at-a-time pruning) — the inverted
    index itself must never be the build side."""
    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.textual import bm25_topk

    docs = load_table(spark, sf_oracle, "documents")
    out = bm25_topk(docs, [("q", ["join", "hash"])], k=5)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_ewma_is_one_window_no_join(spark, sf_oracle):
    """r5 session 4 (q56 ewma): the whole smoother must plan as ONE
    window over one exchange — any join or second exchange means the
    lag-chain form regressed."""
    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.relational import (
        ewma_smooth,
    )
    ev = load_table(spark, sf_oracle, "events")
    out = ewma_smooth(ev, ["user_id"], ["ts", "event_id"], "value")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p
    assert p.count("Exchange") == 1
    assert p.count("Window") == 1


def test_transition_matrix_single_scan_no_join(spark, sf_oracle):
    """r5 session 4 (q30 markov): ONE event scan through one lag
    window + pair aggregate; the row-stochastic denominator is a sum
    window over the tiny pair table — a join here would re-plan the
    whole lag branch per side (the bug this pin caught on first
    write)."""
    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.relational import (
        transition_matrix,
    )
    ev = load_table(spark, sf_oracle, "events")
    out = transition_matrix(ev, ["user_id"], ["ts", "event_id"],
                            "event_type")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p
    assert p.count("FileScan") == 1
    assert p.count("Window") == 2  # lag pass + denominator sum


def test_pareto_local_prune_precedes_global_sweep(spark, sf_oracle):
    """r5 session 4 (q10 pareto): two Window nodes — the partition-id
    local prune (parallel) then the global sweep — and the global
    window's input must be the pruned frame, not the full scan (pin:
    exactly one single-partition exchange)."""
    from pyspark.sql import functions as F

    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.relational import (
        pareto_frontier_2d,
    )
    orders = load_table(spark, sf_oracle, "orders").withColumn(
        "d", F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long"))
    out = pareto_frontier_2d(orders, "o_totalprice", "d", "o_orderkey")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("Window") == 2
    assert "SinglePartition" in p


def test_profile_stats_pass_is_one_aggregate(spark, sf_oracle):
    """r5 session 4 (q12 profile): the stats pass must be a single
    global aggregate over one scan (no joins); only the modal-value
    melt adds a groupBy shuffle."""
    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.relational import (
        profile_table,
    )
    docs = load_table(spark, sf_oracle, "documents")
    p = (profile_table(docs)._jdf.queryExecution().executedPlan()
         .toString())
    assert "Join" not in p or "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_dsir_model_broadcasts_onto_occurrences(spark, sf_oracle):
    from pyspark.sql import functions as F

    """r7 session 3 (q36 dsir): the ≤n_buckets-row log-ratio model
    must be the BUILD side of the scoring join — a shuffle of the
    occurrence stream on bucket id means the broadcast regressed."""
    from bigdata_spark_assignment_spark.io import load_table
    from bigdata_spark_assignment_spark.operators.textual import (
        dsir_importance_scores,
    )

    docs = load_table(spark, sf_oracle, "documents")
    scores, _ = dsir_importance_scores(docs, F.col("lang") == "en",
                                       n_buckets=64)
    p = scores._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q21_decorrelation_is_windows_not_self_joins(spark, sf_oracle):
    """r7 session 3 (q58 q21): the EXISTS/NOT-EXISTS correlation must
    plan as window functions over the (order, supplier) aggregate —
    zero joins of lineitem against itself (the correlated spelling
    would scan the fact three times)."""
    from bigdata_spark_assignment_spark.io import load_table

    from pyspark.sql import functions as F

    li = load_table(spark, sf_oracle, "lineitem")
    from pyspark.sql import Window as W
    ms = (li.groupBy("l_orderkey", "l_suppkey")
          .agg(F.max("l_shipdate").alias("sd")))
    wo = W.partitionBy("l_orderkey")
    st = (ms.withColumn("ns", F.count(F.lit(1)).over(wo))
          .withColumn("mx", F.max("sd").over(wo)))
    st = st.withColumn(
        "n_at_mx",
        F.sum(F.when(F.col("sd") == F.col("mx"), 1).otherwise(0))
        .over(wo))
    out = (st.filter((F.col("ns") >= 2) & (F.col("sd") == F.col("mx"))
                     & (F.col("n_at_mx") == 1))
           .groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait")))
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    # the whole decorrelation is aggregates + windows: the (order,
    # supplier) combine, ONE window-stack exchange on orderkey (the
    # three window exprs share it), and the final suppkey group-by —
    # a fourth exchange or any join means the shape regressed
    assert p.count("Exchange") <= 3


def test_lpa_argmax_is_partial_aggregable(spark, sf_oracle):
    """r7 session 3 (q53 lpa): the per-round plurality argmax must be
    a hash aggregate over max(struct(...)), not a row_number window
    (which would sort every group per round)."""
    from bigdata_spark_assignment_spark.operators.dedup import (
        label_propagation,
    )

    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "id_a long, id_b long")
    p = (label_propagation(pairs, rounds=2)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in p
    assert "partial_max" in p or "HashAggregate" in p


def test_q41_fanout_is_one_exchange_constant_explode(spark, sf_oracle):
    """r9: the occupancy-pinned q41 rewrite must keep the exact shape
    its 100 TB story claims — one pruned scan, a CONSTANT-size explode
    (the 0..n_chunks-1 sequence folds to a literal array; no literal
    struct-per-chunk expression that grows with the auto-sized count),
    exactly ONE hash Exchange on (gi, gj), and the Arrow group map."""
    p = _plan(spark, sf_oracle, "q41_embedding_neardup_cosine")
    assert p.count("Exchange") == 2   # one node: tree line + detail
    assert "FlatMapGroupsInPandas" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    # column pruning: the corpus scan reads only (vec_id, embedding)
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in p


def test_q07_base_fanout_is_size_gated(spark, sf_oracle):
    """r9 (VERDICT r8 #7): q07's base projection uses io.scan_fanout,
    not an unconditional repartition. At sf0.01 the lineitem file is
    under FANOUT_MIN_BYTES, so the gate must hold and the plan must
    contain NO round-robin repartition Exchange — the signature the
    old unconditional .repartition() always left. (At the benched
    sf0.1 the file is 10.3 MiB and the gate fires; at cluster scale
    the partition-count gate makes it a no-op again.)"""
    p = _plan(spark, sf_oracle, "q07_correlation")
    assert "REPARTITION_BY_NUM" not in p
    assert "RoundRobinPartitioning" not in p
