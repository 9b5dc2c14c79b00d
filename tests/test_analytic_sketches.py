"""Approximate-aggregate contracts: sketches must land within their
documented error bounds of the exact answers (the check an oracle
hash-match can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_spark_assignment_spark.io import load_table


def test_approx_count_distinct_error_bound(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    exact = {r.l_returnflag: r.n for r in
             li.groupBy("l_returnflag")
               .agg(F.countDistinct("l_orderkey").alias("n")).collect()}
    approx = {r.l_returnflag: r.n for r in
              li.groupBy("l_returnflag")
                .agg(F.approx_count_distinct("l_orderkey", 0.02).alias("n"))
                .collect()}
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err < 0.06, (k, exact[k], approx[k])  # 3x rsd=0.02


def test_percentile_approx_error_bound(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem")
    exact = {r.l_returnflag: r.m for r in
             li.groupBy("l_returnflag")
               .agg(F.percentile("l_extendedprice", 0.5).alias("m"))
               .collect()}
    approx = {r.l_returnflag: r.m for r in
              li.groupBy("l_returnflag")
                .agg(F.percentile_approx("l_extendedprice", 0.5, 1000)
                     .alias("m")).collect()}
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / exact[k]
        assert rel_err < 0.02, (k, exact[k], approx[k])


def test_kmv_sketch_mergeable_and_exact_below_k(spark):
    """r5 KMV: (a) below-k sets degrade to EXACT estimates (the sketch
    IS the set); (b) the sketch of a union equals the union of
    sketches re-truncated to k — the mergeability that makes KMV a
    partition-synopsis at scale."""
    from pyspark.sql import functions as F

    from bigdata_spark_assignment_spark.operators.sketches import (
        kmv_intersection_estimate,
        kmv_sketch,
    )
    a = spark.range(0, 120).withColumnRenamed("id", "key")
    b = spark.range(80, 200).withColumnRenamed("id", "key")
    r = kmv_intersection_estimate(a, b, "key", k=256).first()
    # |A u B| = 200 < k: everything exact
    assert r.uk == 200 and r.est_union == 200.0
    assert r.j == 40 and r.est_intersection == 40
    # mergeability
    union_direct = kmv_sketch(a.unionByName(b), "key", k=64)
    union_merged = (kmv_sketch(a, "key", k=64)
                    .unionByName(kmv_sketch(b, "key", k=64))
                    .distinct().orderBy("h").limit(64))
    assert (sorted(x.h for x in union_direct.collect())
            == sorted(x.h for x in union_merged.collect()))


def test_kmv_estimate_within_error_bound(spark):
    """KMV standard error is ~1/sqrt(k); at k=256 allow 4 sigma
    (~25%) on a 5000-element union with 40% overlap."""
    from bigdata_spark_assignment_spark.operators.sketches import (
        kmv_intersection_estimate,
    )
    a = spark.range(0, 3500).withColumnRenamed("id", "key")
    b = spark.range(1500, 5000).withColumnRenamed("id", "key")
    r = kmv_intersection_estimate(a, b, "key", k=256).first()
    assert abs(r.est_union - 5000) / 5000 < 0.25
    assert abs(r.est_intersection - 2000) / 2000 < 0.35


def test_cms_one_sided_error_and_mergeability(spark):
    """r5 session 3 CMS: (a) every point estimate ≥ the true count
    (one-sided error, the CMS invariant); (b) a deliberately tight
    grid produces at least one strict overestimate (so the q72 oracle
    is exercising real collisions, not an exact table in disguise);
    (c) grids merge by cellwise addition — the partition-synopsis
    property; (d) never-seen items estimate 0 when collision-free at
    a wide width."""
    from bigdata_spark_assignment_spark.operators.sketches import (
        cms_build,
        cms_point_estimates,
    )
    items = (spark.range(0, 2000)
             .select((F.col("id") % 500).cast("string").alias("item")))
    truth = {r.item: r.c for r in
             items.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
             .collect()}
    grid = cms_build(items, "item", depth=3, width=64)
    est = {r.item: r.cms_est for r in
           cms_point_estimates(grid, items.distinct(), "item",
                               depth=3, width=64).collect()}
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)
    assert any(est[k] > truth[k] for k in truth)  # 500 keys in 64 cells

    # mergeability: grid(A ++ B) == cellwise-sum(grid(A), grid(B))
    a = items.filter(F.col("item").cast("int") < 250)
    b = items.filter(F.col("item").cast("int") >= 250)
    merged = (cms_build(a, "item", depth=3, width=64)
              .unionByName(cms_build(b, "item", depth=3, width=64))
              .groupBy("d", "bucket").agg(F.sum("c").alias("c")))
    direct = {(r.d, r.bucket): r.c for r in grid.collect()}
    summed = {(r.d, r.bucket): r.c for r in merged.collect()}
    assert direct == summed

    # unseen item at a wide width: all three cells empty -> exact 0
    unseen = spark.createDataFrame([("zzz-never-seen",)], ["item"])
    wide = cms_build(items, "item", depth=3, width=1 << 20)
    z = cms_point_estimates(wide, unseen, "item",
                            depth=3, width=1 << 20).first()
    assert z.cms_est == 0


def test_cms_join_size_estimate_bounds(spark):
    """r5 session 3: the grid inner-product join-size estimate is
    (a) ≥ the true join size at a tight width (one-sided), (b) EXACT
    at a wide collision-free width, (c) zero for disjoint key sets at
    the wide width."""
    from bigdata_spark_assignment_spark.operators.sketches import (
        cms_build,
        cms_join_size_estimate,
    )
    a = (spark.range(0, 600)
         .select((F.col("id") % 100).cast("string").alias("k")))
    b = (spark.range(0, 900)
         .select((F.col("id") % 150).cast("string").alias("k")))
    # truth: keys 0..99 appear 6x in a; in b keys 0..99 appear 6x,
    # 100..149 appear 6x -> sum over shared 0..99 of 6*6 = 3600
    truth = 3600
    tight = cms_join_size_estimate(
        cms_build(a, "k", depth=3, width=32),
        cms_build(b, "k", depth=3, width=32)).first().join_size_est
    assert tight >= truth
    wide = cms_join_size_estimate(
        cms_build(a, "k", depth=3, width=1 << 20),
        cms_build(b, "k", depth=3, width=1 << 20)).first().join_size_est
    assert wide == truth
    c = spark.range(0, 50).select(
        (F.col("id") + 1000).cast("string").alias("k"))
    disjoint = cms_join_size_estimate(
        cms_build(a, "k", depth=3, width=1 << 20),
        cms_build(c, "k", depth=3, width=1 << 20)).first().join_size_est
    assert disjoint == 0


def test_ams_f2_estimate_quality_and_exactness(spark):
    """AMS tug-of-war: on a known frequency vector the estimator mean
    (sum_sq/k) must land within the 3-sigma AMS bound of exact F2,
    and a uniform-frequency stream (c=1 each) must estimate ~n."""
    from bigdata_spark_assignment_spark.operators.sketches import (
        ams_f2_sum_sq,
    )

    # skewed: one heavy key (c=100) among 50 singletons
    rows = ([("g", 1)] * 100 + [("g", 10 + i) for i in range(50)])
    df = spark.createDataFrame(rows, "grp string, key long")
    f2 = 100 * 100 + 50
    got = ams_f2_sum_sq(df, "key", ["grp"], k=16).collect()[0]
    est = got["ams_sum_sq"] / 16.0
    # Var(S^2) <= 2*F2^2 per estimator -> sd(mean of 16) ~ 0.354*F2
    assert abs(est - f2) <= 3 * 0.354 * f2
    # determinism: same input, same estimate
    again = ams_f2_sum_sq(df, "key", ["grp"], k=16).collect()[0]
    assert again["ams_sum_sq"] == got["ams_sum_sq"]
