"""SparkSession factory.

The reference hard-codes ``local[12]`` and nothing else
(``Main.scala:42-47``). We instead centralize a builder with the
settings that matter for both local test runs and a real cluster:

* AQE on (runtime shuffle coalescing, skew-join splitting, broadcast
  demotion) — the main lever that keeps one static plan viable from
  sf0.001 up to 100 TB;
* shuffle partitions sized to local cores by default — on a cluster
  AQE's ``coalescePartitions`` re-sizes them from the initial number,
  so the static setting only needs to be "not absurdly small";
* session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (DuckDB timestamps are UTC-naive);
* Arrow enabled for any pandas interchange (similarity / multimodal
  pandas UDFs).

100 TB notes: on a real cluster you would additionally set
``spark.sql.files.maxPartitionBytes`` (128-256 MB), executor
memory/cores, and rely on dynamic allocation. Nothing in this module
assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session(app_name: str = "bigdata_spark_assignment_spark",
                shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) the singleton SparkSession with engine defaults."""
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
