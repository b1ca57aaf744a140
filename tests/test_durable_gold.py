"""Production-shape wiring: streaming CDC → medallion pipeline →
DURABLE gold tables (parquet via materialize_incremental), surviving a
stream restart with a checkpoint — the full reference deployment story
(consumer + DAG + dbt) as one restartable Spark job."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.plans.materialize import (
    materialize_incremental,
)
from realtime_banking_cdc_pipeline_spark.plans.medallion import (
    MedallionState,
    run_pipeline,
)
from realtime_banking_cdc_pipeline_spark.streaming.ingest import (
    read_fixture_stream,
    start_pipeline_stream,
)


def test_streaming_to_durable_gold_across_restart(spark, banking_fixture):
    src = tempfile.mkdtemp(prefix="dur_src_")
    ckpt = tempfile.mkdtemp(prefix="dur_ckpt_")
    gold_dir = tempfile.mkdtemp(prefix="dur_gold_")
    state_dir = tempfile.mkdtemp(prefix="dur_state_")
    fact_path = os.path.join(gold_dir, "fact_transactions")

    fx = banking_fixture
    half = len(fx.events) // 2

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

    # a restarted job reloads its durable state (SCD2 snapshots + fact)
    def run_once():
        state = MedallionState.load(spark, state_dir)

        def on_batch(batch_df, epoch):
            nonlocal state
            batch = batch_df.select("topic", "key", "value", "ts").cache()
            state, gold = run_pipeline(spark, batch, state=state)
            materialize_incremental(
                spark,
                gold["fact_transactions"],
                fact_path,
                unique_key="transaction_id",
            )
            state.save(state_dir)
            state = MedallionState.load(spark, state_dir)

        q = start_pipeline_stream(
            spark, read_fixture_stream(spark, src), on_batch, ckpt
        )
        q.awaitTermination(300)

    write_shard(fx.events[:half], "part-0000.jsonl")
    run_once()
    n1 = spark.read.parquet(fact_path).count()
    assert n1 > 0

    # job restarts; new data arrived while down
    write_shard(fx.events[half:], "part-0001.jsonl")
    run_once()

    fact = spark.read.parquet(fact_path)
    expected = len(fx.expected_current["transactions"])
    assert fact.count() == expected
    # unique key held across restarts (idempotent durable merge)
    dups = fact.groupBy("transaction_id").count().filter(F.col("count") > 1)
    assert dups.count() == 0
    # every fact resolves customer_id even when its account image arrived
    # in a pre-restart batch (cumulative dim join, not batch-local)
    assert fact.filter(F.col("customer_id").isNull()).count() == 0

    # SCD2 version history survived the restart: per-key version counts
    # match the single-shot goldens
    final = MedallionState.load(spark, state_dir)
    got = {
        int(r["customer_id"]): r["n"]
        for r in final.snapshots["customers"]
        .groupBy("customer_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == fx.expected_versions["customers"]
