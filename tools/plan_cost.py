"""Split a query's wall time into build / plan / execute.

Usage: python tools/plan_cost.py <query> [query ...]

build  = Python DataFrame construction (includes any eager actions the
         builder itself runs, e.g. counts for adaptive parameters)
plan   = forcing queryExecution().executedPlan (analysis + optimization
         + physical planning; codegen compile happens at execute)
exec   = noop write of the already-planned frame

Two passes; second pass reported (steady state).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_banking_cdc_pipeline_spark.caching import release_caches  # noqa: E402
from realtime_banking_cdc_pipeline_spark.queries import QUERIES  # noqa: E402
from realtime_banking_cdc_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-cost")
    for name in names:
        for p in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name].spark(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            release_caches()
            if p == 1:
                print(
                    f"{name}: build={t1 - t0:.2f}s plan={t2 - t1:.2f}s "
                    f"exec={t3 - t2:.2f}s total={t3 - t0:.2f}s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
