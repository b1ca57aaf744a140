"""Ad-hoc local benchmark for a named query subset at an arbitrary
sf_dir — the tool behind the BENCH_LOCAL_* artifacts (bench.py is the
driver-facing headline set; this one answers "how does operator X
behave at the amplified sf1 / sf1-perturbed regimes").

Usage: python tools/bench_local.py <sf_dir> <query> [query ...]
Prints one JSON line {query: sec} (single timed pass on a warm JVM,
noop sink, caches released between queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_banking_cdc_pipeline_spark.caching import release_caches  # noqa: E402
from realtime_banking_cdc_pipeline_spark.queries import QUERIES  # noqa: E402
from realtime_banking_cdc_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("bench-local")
    import glob

    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        try:
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    # drift canaries run first in every invocation (r8 judge directive
    # #3): their geomean is the run's box-speed unit, making BENCH_LOCAL
    # rows comparable across rounds via time/canary ratios. Skippable
    # for stage-isolated probes via SPARK_GRAFT_NO_CANARY=1.
    from bench import CANARIES, canary_fields

    timings: dict[str, float] = {}
    run_names = list(names)
    if not os.environ.get("SPARK_GRAFT_NO_CANARY"):
        run_names = [c for c in CANARIES if c not in names] + run_names
    for name in run_names:
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
        release_caches()
        print(json.dumps({name: timings[name]}), flush=True)
    out = {
        "sf_dir": sf_dir,
        "queries_sec": {n: timings[n] for n in names if n in timings},
    }
    out.update(canary_fields(timings))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
