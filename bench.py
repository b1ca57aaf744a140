"""Headline-query benchmark.

Runs the bench-flagged registry queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is end-to-end per query: plan construction + execution into the
noop sink, which materializes every output row and column (a count()
would let Catalyst prune the projections) without driver-collect noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from realtime_banking_cdc_pipeline_spark.queries import QUERIES  # noqa: E402
from realtime_banking_cdc_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    names = [n for n, s in QUERIES.items() if s.bench]
    # Warm-up: one untimed end-to-end pass of every benched query (plus
    # full table scans), then the timed pass — steady-state numbers, not
    # cold-JVM JIT / codegen-compile / first-scan codec effects. (A
    # count() warm-up would not do: parquet satisfies counts from
    # footers without touching the data path.)
    import glob as _glob

    for p in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # nanos-typed tables need the query-level reader conf
    for name in names:
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "headline_query_wall_time_sf" + str(sf),
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "warmup_passes": 1,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
