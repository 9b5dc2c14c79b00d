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
