"""Exactly-once across restarts: a checkpointed stream stopped and
restarted over a growing fixture directory must process each file once
— the property the reference's re-COPY-every-minute DAG lacks
(minio_to_snowflake_dag.py:41-49) and checkpoints provide."""

from __future__ import annotations

import json
import os
import tempfile

from realtime_banking_cdc_pipeline_spark.streaming.ingest import read_fixture_stream


def _run_counting_stream(spark, src, ckpt, sink: list):
    stream = read_fixture_stream(spark, src)

    def on_batch(df, epoch):
        rows = df.count()
        if rows:
            sink.append(rows)

    q = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_checkpoint_resume_processes_each_file_once(spark, banking_fixture):
    src = tempfile.mkdtemp(prefix="resume_src_")
    ckpt = tempfile.mkdtemp(prefix="resume_ckpt_")

    fx = banking_fixture
    half = len(fx.events) // 2
    first, second = fx.events[:half], fx.events[half:]

    def write_shard(events, name):
        with open(os.path.join(src, name), "w") as f:
            f.write(
                "\n".join(
                    json.dumps(
                        {"topic": e.topic, "key": e.key, "value": e.value, "ts": e.ts_ms}
                    )
                    for e in events
                )
            )

    write_shard(first, "part-0000.jsonl")
    seen: list[int] = []
    _run_counting_stream(spark, src, ckpt, seen)
    assert sum(seen) == len(first)

    # new data arrives while the stream is down
    write_shard(second, "part-0001.jsonl")
    _run_counting_stream(spark, src, ckpt, seen)
    # resumed stream processed ONLY the new file — no re-read of part-0000
    assert sum(seen) == len(first) + len(second)

    # a third restart with nothing new processes nothing
    _run_counting_stream(spark, src, ckpt, seen)
    assert sum(seen) == len(first) + len(second)
