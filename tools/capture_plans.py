"""Capture .explain("formatted") for bench queries into
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r17).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: e.g. "before" or "after" -> plans/<round>/<query>_<suffix>.txt

NOT execution-free (r16 ADVICE): building many of these queries runs
their EAGER actions — localCheckpoints, adaptive-parameter counts,
iterative loops — so capturing plans executes those subtrees. Do not
run it concurrently with benchmarks or other timing work (the repo's
measurement-discipline rule).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_banking_cdc_pipeline_spark.caching import release_caches  # noqa: E402
from realtime_banking_cdc_pipeline_spark.queries import QUERIES  # noqa: E402
from realtime_banking_cdc_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n, s in QUERIES.items() if s.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")
        release_caches()


if __name__ == "__main__":
    main()
