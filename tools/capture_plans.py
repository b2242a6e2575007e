"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [query ...]   # default: all HEADLINE

Driver-only (no jobs run): each query builds its DataFrame against
$SPARK_GRAFT_SF_DIR (default sf0.1) and the formatted plan is written to
plans/<tag>/<query>.txt. With AQE on these are the initial plans
(isFinalPlan=false) — Exchange counts / join strategies / PushedFilters
are what the judge checks.

Note: operators with a materialization step (training loops with
localCheckpoint, index builds) DO execute jobs when the DataFrame is
built; those capture the plan of the final returned frame.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "now"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from dbt_fusion_spark.session import get_spark
    from dbt_fusion_spark.demo import QUERIES
    import bench

    spark = get_spark(app_name="plan-capture",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        names = [n for n in bench.HEADLINE if n in QUERIES]
    for name in names:
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception:
            plan = "ERROR\n" + traceback.format_exc()
        dt = time.perf_counter() - t0
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {dt:.1f}s build+explain, "
              f"{plan.count('Exchange')} Exchange mentions", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
