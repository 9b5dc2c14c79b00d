"""A/B harness for the q53 connected-components variants (r12,
VERDICT r11 #1): adjudicate the lazy-localCheckpoint + persisted-edge
CC change at BOTH core counts the driver measures.

Runs the full q53_neardup_clusters plan (driver-shaped: bench warmups,
noop sink, median-of-3) under one variant per process:

    AB_EAGER=0|1    localCheckpoint eager flag (r11 shipped 0; r10 = 1)
    AB_PERSIST=0|1  persist the static edge list (r11 shipped 1; r10 = 0)
    SPARK_GRAFT_CPUS=8|32

Prints one JSON line: variant, cpus, per-sample seconds, median, and
the per-round stats (round, changed/edges, seconds) of a dedicated
instrumented CC pass so per-round cost is visible.

Usage: AB_EAGER=0 AB_PERSIST=1 SPARK_GRAFT_CPUS=32 python tools/ab_cc.py
"""
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EAGER = os.environ.get("AB_EAGER", "0") == "1"
PERSIST = os.environ.get("AB_PERSIST", "1") == "1"


def main() -> None:
    from bigdata_spark_assignment_spark import operators
    from bigdata_spark_assignment_spark.operators import dedup
    from bigdata_spark_assignment_spark.session import get_session

    # pin the variant by wrapping the operators the q53 plan calls
    orig_prop = dedup.neardup_clusters
    orig_star = dedup.neardup_clusters_star
    dedup.neardup_clusters = functools.partial(
        orig_prop, eager_checkpoint=EAGER, persist_edges=PERSIST)
    dedup.neardup_clusters_star = functools.partial(
        orig_star, eager_checkpoint=EAGER)

    import bench
    from bigdata_spark_assignment_spark.plans import REGISTRY

    spark = get_session(app_name="ab-cc")
    bench._warmup(spark)
    bench._warm_plans(spark, {"q53_neardup_clusters":
                              REGISTRY["q53_neardup_clusters"]},
                      set(), SF_DIR)

    q = REGISTRY["q53_neardup_clusters"]
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
        dedup.unpersist_dedup_caches()

    # instrumented single CC passes for per-round visibility
    from bigdata_spark_assignment_spark.io import fanout_cache
    from bigdata_spark_assignment_spark.io import load_table

    docs = fanout_cache(load_table(spark, SF_DIR, "documents"))
    pairs = dedup._track_persist(dedup.neardup_pairs_minhash(
        docs, "doc_id", "text", threshold=0.6))
    pairs.write.format("noop").mode("overwrite").save()
    rs_prop: list = []
    t0 = time.perf_counter()
    orig_prop(pairs, round_stats=rs_prop, eager_checkpoint=EAGER,
              persist_edges=PERSIST) \
        .write.format("noop").mode("overwrite").save()
    prop_s = round(time.perf_counter() - t0, 3)
    rs_star: list = []
    t0 = time.perf_counter()
    orig_star(pairs, round_stats=rs_star, eager_checkpoint=EAGER) \
        .write.format("noop").mode("overwrite").save()
    star_s = round(time.perf_counter() - t0, 3)
    dedup.unpersist_dedup_caches()

    print(json.dumps({
        "variant": {"eager": EAGER, "persist_edges": PERSIST},
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "q53_samples": samples,
        "q53_median": statistics.median(samples),
        "prop_only_seconds": prop_s, "prop_rounds": rs_prop,
        "star_only_seconds": star_s, "star_rounds": rs_star,
    }), flush=True)


if __name__ == "__main__":
    main()
