"""Dump .explain("formatted") for named registered queries to files.

Usage:
    python tools/dump_plans.py OUTDIR SUFFIX [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query name (default: the
r11-touched set). Runs at sf0.001 so iterative plans (which execute
convergence actions during construction) stay cheap; the plan SHAPE
(join strategies, Exchange count, PushedFilters, codegen spans) is
what the files witness, not timings.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_spark_assignment_spark.plans import REGISTRY  # noqa: E402
from bigdata_spark_assignment_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_session(app_name="dump-plans")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
