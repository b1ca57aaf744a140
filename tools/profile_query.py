"""Per-stage profile of one registry query.

Usage: python tools/profile_query.py <query> [sf_dir] [passes]

Runs the query into the noop sink with the UI status store on, then
dumps each stage's duration, task time, input/shuffle bytes, and peak
task-time skew from the REST API. Guide §1/§7: decide whether time is
scan, shuffle, compute or Python before touching anything.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_banking_cdc_pipeline_spark.caching import release_caches  # noqa: E402
from realtime_banking_cdc_pipeline_spark.queries import QUERIES  # noqa: E402
from realtime_banking_cdc_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(
        "profile-" + name,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedJobs": "4000",
            "spark.ui.retainedStages": "4000",
        },
    )
    # warm-up pass (JIT, page cache), then timed pass
    walls = []
    for i in range(passes):
        spark.sparkContext.setJobGroup(f"pass{i}", name)
        t0 = time.perf_counter()
        df = QUERIES[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
        release_caches()
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/jobs", timeout=30
    ) as r:
        jobs = json.load(r)
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?details=false", timeout=30
    ) as r:
        stages = json.load(r)
    by_id = {}
    for st in stages:
        by_id.setdefault(st.get("stageId"), st)
    last = f"pass{passes - 1}"
    rows = []
    for j in jobs:
        if (j.get("jobGroup") or "") != last:
            continue
        for sid in sorted(j.get("stageIds", [])):
            st = by_id.get(sid)
            if not st or st.get("status") == "SKIPPED":
                continue
            sub = st.get("submissionTime")
            comp = st.get("completionTime")
            dur = None
            if sub and comp:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
                ).total_seconds()
            rows.append(
                {
                    "stage": sid,
                    "job": j["jobId"],
                    "dur_s": round(dur, 2) if dur is not None else None,
                    "tasks": st.get("numCompleteTasks"),
                    "task_time_s": round(
                        st.get("executorRunTime", 0) / 1000.0, 1
                    ),
                    "cpu_s": round(
                        st.get("executorCpuTime", 0) / 1e9, 1
                    ),
                    "input_mb": round(st.get("inputBytes", 0) / 1e6, 1),
                    "in_rows": st.get("inputRecords", 0),
                    "sh_read_mb": round(
                        st.get("shuffleReadBytes", 0) / 1e6, 1
                    ),
                    "sh_read_rows": st.get("shuffleReadRecords", 0),
                    "sh_write_mb": round(
                        st.get("shuffleWriteBytes", 0) / 1e6, 1
                    ),
                    "spill_mb": round(
                        st.get("diskBytesSpilled", 0) / 1e6, 1
                    ),
                    "name": (st.get("name") or "")[:80],
                }
            )
    print(json.dumps({"query": name, "walls": [round(w, 3) for w in walls]}))
    rows.sort(key=lambda r: -(r["task_time_s"] or 0))
    for r2 in rows:
        print(json.dumps(r2))
    # job timeline for the last pass: durations + gaps (driver think time)
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    tl = []
    for j in jobs:
        if (j.get("jobGroup") or "") != last:
            continue
        sub = datetime.strptime(j["submissionTime"], fmt)
        comp = datetime.strptime(j["completionTime"], fmt)
        tl.append((sub, comp, j["jobId"], j.get("description") or ""))
    tl.sort()
    print("--- job timeline (last pass) ---")
    prev_end = None
    for sub, comp, jid, desc in tl:
        gap = (sub - prev_end).total_seconds() if prev_end else 0.0
        print(
            f"job {jid}: dur={(comp - sub).total_seconds():.2f}s "
            f"gap_before={gap:.2f}s  {desc[:60]}"
        )
        prev_end = max(prev_end, comp) if prev_end else comp


if __name__ == "__main__":
    main()
