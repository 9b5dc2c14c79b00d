"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke check).
``queries()`` — named engine queries, one per implemented operator
(SURVEY.md §2), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching ANSI-SQL strings DuckDB runs on the same
parquet tables; queries without an entry get a rows-only check.

The real surface lives in ``bigdata_spark_assignment_spark.plans``;
this module is a thin adapter so the engine stays importable as a
package independent of the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from bigdata_spark_assignment_spark.plans import (  # noqa: E402
    oracle_dict,
    queries_dict,
)
from bigdata_spark_assignment_spark.plans.relational import (  # noqa: E402
    pricing_summary,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query name (subset of queries())."""
    return oracle_dict()
