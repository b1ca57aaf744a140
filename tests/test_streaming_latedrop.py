"""Watermark late-drop parity: Structured Streaming's drop accounting
(`numRowsDroppedByWatermark`) must match the batch high-watermark rule
that `c7_late_events` audits — the engine's operational view of "late"
and the batch audit agree on the same data.

Found while building this test (and asserted below because it matters
operationally): late-row dropping only happens under a LIVE trigger,
where batch N runs with the watermark committed by batch N-1. Under
Trigger.AvailableNow the planned batches replay with the initial
watermark, so a backfill does NOT drop late data — which is exactly
what you want from a backfill, and exactly what you must not assume
about the steady-state stream."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

BASE = "2024-01-01 12:{:02d}:00"
LATE = ["2024-01-01 11:00:00", "2024-01-01 11:30:00", "2024-01-01 10:00:00"]
FRESH = ["2024-01-01 12:30:00", "2024-01-01 12:31:00"]


def _progress(q):
    return [json.loads(p.json) if hasattr(p, "json") else p for p in q.recentProgress]


def _drops(q):
    return sum(
        op.get("numRowsDroppedByWatermark", 0) or 0
        for d in _progress(q)
        for op in d.get("stateOperators", [])
    )


def test_watermark_drops_match_batch_late_rule(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    batch1 = [{"k": "a", "ts": BASE.format(m)} for m in range(20)]  # ..12:19
    with open(os.path.join(src, "b1.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in batch1))

    stream = (
        spark.readStream.schema("k string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .select("k", F.col("ts").cast("timestamp").alias("ts"))
    )
    dd = stream.withWatermark("ts", "5 minutes").dropDuplicates(["k", "ts"])
    q = (
        dd.writeStream.outputMode("append")
        .format("memory")
        .queryName("latedrop_out")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait until batch 1 ran: the watermark from batch 0's data
        # (12:19 - 5 min = 12:14) is then committed and enforced
        deadline = time.time() + 120
        while time.time() < deadline:
            if any(d["batchId"] >= 1 for d in _progress(q)):
                break
            time.sleep(0.5)
        batch2 = [{"k": "a", "ts": t} for t in LATE + FRESH]
        with open(os.path.join(src, "b2.json"), "w") as f:
            f.write("\n".join(json.dumps(r) for r in batch2))
        deadline = time.time() + 120
        while time.time() < deadline:
            if sum(d["numInputRows"] for d in _progress(q)) >= len(batch1) + len(
                batch2
            ):
                break
            time.sleep(0.5)
        time.sleep(2)  # let the progress event for the last batch land
        dropped = _drops(q)
    finally:
        q.stop()

    # batch twin of the rule (what c7_late_events audits per key):
    # late iff ts < max(prior arrivals' ts) - delay
    hwm = (
        spark.createDataFrame([(r["ts"],) for r in batch1], "ts string")
        .select(F.col("ts").cast("timestamp").alias("ts"))
        .agg(F.max("ts").alias("m"))
        .collect()[0]["m"]
    )
    b2 = spark.createDataFrame([(t,) for t in LATE + FRESH], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    want = b2.filter(F.col("ts") < F.lit(hwm) - F.expr("INTERVAL 5 MINUTES")).count()

    assert want == len(LATE)
    assert dropped == want, f"stream dropped {dropped}, batch rule says {want}"
    # dropped rows never reached the sink
    got_late = spark.sql(
        "SELECT count(*) AS n FROM latedrop_out WHERE ts < timestamp'2024-01-01 12:00:00'"
    ).collect()[0]["n"]
    assert got_late == 0


def test_availablenow_backfill_does_not_drop(spark, tmp_path):
    """The replay/backfill contract: with Trigger.AvailableNow all
    planned batches run with the initial watermark, so nothing is
    dropped — a backfill ingests everything, late or not."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    b1 = [{"k": "a", "ts": BASE.format(m)} for m in range(20)]
    b2 = [{"k": "a", "ts": t} for t in LATE]
    for name, rows, mt in (("b1.json", b1, now - 60), ("b2.json", b2, now)):
        p = os.path.join(src, name)
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (mt, mt))
    stream = (
        spark.readStream.schema("k string, ts string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .select("k", F.col("ts").cast("timestamp").alias("ts"))
    )
    dd = stream.withWatermark("ts", "5 minutes").dropDuplicates(["k", "ts"])
    q = (
        dd.writeStream.outputMode("append")
        .format("memory")
        .queryName("backfill_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    dropped = _drops(q)
    q.stop()
    n = spark.sql("SELECT count(*) AS n FROM backfill_out").collect()[0]["n"]
    assert dropped == 0
    assert n == len(b1) + len(b2)
