"""Structured Streaming tests: fixture file-source → medallion pipeline
via foreachBatch (exactly-once per checkpoint), in-stream dedup, and
event-time windowed aggregates vs their batch twins."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.plans.medallion import (
    MedallionState,
    run_pipeline,
)
from realtime_banking_cdc_pipeline_spark.sources import fixtures
from realtime_banking_cdc_pipeline_spark.streaming.analytics import (
    session_aggregates,
    sliding_velocity,
    tumbling_counts,
)
from realtime_banking_cdc_pipeline_spark.streaming.ingest import (
    kafka_source_options,
    read_fixture_stream,
    read_kafka_stream,
    start_pipeline_stream,
    with_stream_dedup,
)


def test_kafka_source_contract(spark):
    """S2 contract: the Kafka reader subscribes to the reference's
    Debezium topic set with the expected offsets, and fails with the
    data-source-lookup error (not silently) when the spark-sql-kafka
    jar is absent — the only coverage possible without the jar."""
    topics = [
        "banking_server.public.customers",
        "banking_server.public.accounts",
        "banking_server.public.transactions",
    ]
    opts = kafka_source_options("broker:9092", topics)
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": ",".join(topics),
        "startingOffsets": "earliest",
    }
    assert kafka_source_options("b", [], starting_offsets="latest")[
        "startingOffsets"
    ] == "latest"
    with pytest.raises(Exception, match="(?i)kafka"):
        read_kafka_stream(spark, "broker:9092", topics)


@pytest.fixture(scope="module")
def fixture_dir(banking_fixture):
    d = tempfile.mkdtemp(prefix="cdc_fixture_")
    fixtures.write_fixture_json(banking_fixture, d)
    return d


def test_streaming_pipeline_matches_batch(spark, banking_fixture, fixture_dir,
                                          fixture_frames):
    stream = with_stream_dedup(read_fixture_stream(spark, fixture_dir))
    state = MedallionState.empty()
    results = {}

    def on_batch(batch_df, epoch_id):
        nonlocal state
        batch = batch_df.select("topic", "key", "value", "ts").cache()
        new_state, gold = run_pipeline(spark, batch, state=state)
        state = new_state
        # materialize per-batch (checkpointed sinks would persist here)
        results["fact_count"] = gold["fact_transactions"].count()
        results["dim_current"] = {
            int(r["customer_id"]): r["email"]
            for r in gold["dim_customers"].filter(F.col("is_current")).collect()
        }

    q = start_pipeline_stream(
        spark, stream, on_batch, tempfile.mkdtemp(prefix="ckpt_")
    )
    q.awaitTermination(300)

    assert results["fact_count"] == len(
        banking_fixture.expected_current["transactions"]
    )
    for cid, img in banking_fixture.expected_current["customers"].items():
        assert results["dim_current"][cid] == img["email"]


def test_windowed_aggregates_stream_vs_batch(spark, fixture_dir):
    """Streaming tumbling counts (availableNow, complete mode via memory
    sink) equal the batch computation on the same frames."""
    stream = read_fixture_stream(spark, fixture_dir)
    agg = tumbling_counts(stream, "ts", ["topic"], window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["w"]["start"], r["topic"]): r["n_events"]
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }

    batch = spark.read.json(fixture_dir).select(
        "topic", F.timestamp_millis(F.col("ts").cast("long")).alias("ts")
    )
    want = {
        (r["w"]["start"], r["topic"]): r["n_events"]
        for r in tumbling_counts(batch, "ts", ["topic"], window="1 hour").collect()
    }
    assert got == want and len(got) > 0


def test_sliding_and_session_windows_batch_semantics(spark, fixture_frames):
    frames = fixture_frames
    slid = sliding_velocity(frames, "ts", "topic", window="1 hour", slide="30 minutes")
    assert slid.filter(F.col("n_events") <= 0).count() == 0
    # every event lands in exactly window/slide = 2 sliding windows
    total = frames.count()
    assert (
        slid.agg(F.sum("n_events").alias("s")).collect()[0]["s"] == 2 * total
    )
    sess = session_aggregates(frames, "ts", "topic", gap="30 minutes")
    assert sess.agg(F.sum("n_events").alias("s")).collect()[0]["s"] == total


def test_pipeline_monitor_freshness(spark, fixture_dir):
    """Ops-metric parity (readme.md:229-232): the listener reports input
    rows and event-time freshness lag against a reference clock."""
    import datetime as dt

    from realtime_banking_cdc_pipeline_spark.streaming import monitor as mon

    m = mon.attach(spark)
    try:
        stream = read_fixture_stream(spark, fixture_dir).withWatermark("ts", "1 minute")
        agg = stream.groupBy(F.window("ts", "1 hour")).count()
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("mon_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # listener callbacks are async — wait briefly for delivery
        deadline = dt.datetime.utcnow() + dt.timedelta(seconds=10)
        while not m.metrics and dt.datetime.utcnow() < deadline:
            import time as _t

            _t.sleep(0.2)
        assert m.total_input_rows() > 0
        # availableNow ends after one batch, so the reported watermark is
        # the initial epoch value — still exercises the lag arithmetic
        lag = m.freshness_lag_seconds()
        assert lag is not None and lag > 0
        fake_now = dt.datetime(2024, 2, 1)
        assert m.check_freshness(100 * 365 * 24 * 3600, now=fake_now)
        assert not m.check_freshness(300)  # replayed history exceeds 5 min
    finally:
        mon.detach(spark, m)


def test_stream_stream_interval_join_matches_batch(spark):
    """Event-time interval join on two streams (watermark-bounded state)
    produces exactly the batch join's pairs."""
    import datetime as dt
    import tempfile

    from realtime_banking_cdc_pipeline_spark.streaming.analytics import interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    logins = [(1, ts(0)), (1, ts(60)), (2, ts(5))]
    purchases = [
        (1, ts(4), 10.0),    # joins login@0 (within 10m)
        (1, ts(63), 20.0),   # joins login@60
        (1, ts(30), 30.0),   # joins nothing (gap > 10m both ways)
        (2, ts(20), 40.0),   # joins nothing
    ]
    ldir, rdir = tempfile.mkdtemp("ssl"), tempfile.mkdtemp("ssr")
    spark.createDataFrame(logins, "user_id long, login_ts timestamp").write.mode(
        "overwrite"
    ).parquet(ldir)
    spark.createDataFrame(
        purchases, "user_id long, buy_ts timestamp, amount double"
    ).write.mode("overwrite").parquet(rdir)

    def run(lf, rf):
        return interval_join(
            lf, rf, "user_id", "login_ts", "buy_ts", upper="10 minutes"
        ).select("l.user_id", "l.login_ts", "r.buy_ts", "r.amount")

    batch = run(spark.read.parquet(ldir), spark.read.parquet(rdir))
    want = sorted(tuple(r) for r in batch.collect())
    assert len(want) == 2  # the two in-interval pairs only

    lstream = spark.readStream.schema("user_id long, login_ts timestamp").parquet(ldir)
    rstream = spark.readStream.schema(
        "user_id long, buy_ts timestamp, amount double"
    ).parquet(rdir)
    q = (
        run(lstream, rstream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM ss_join_out").collect())
    assert got == want


def test_observed_metrics_ride_query_progress(spark, fixture_dir):
    """df.observe computes business counters INSIDE the running query
    (no second data pass); the listener surfaces them per batch."""
    from realtime_banking_cdc_pipeline_spark.streaming import monitor as mon

    m = mon.attach(spark)
    try:
        stream = read_fixture_stream(spark, fixture_dir).observe(
            "ingest",
            F.count(F.lit(1)).alias("rows"),
            F.count(F.when(F.col("topic").endswith(".transactions"), 1)).alias(
                "txn_rows"
            ),
        )
        q = (
            stream.writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        import time as _t

        deadline = _t.monotonic() + 10
        while _t.monotonic() < deadline:
            if any(mm.observed for mm in m.metrics):
                break
            _t.sleep(0.2)
        totals = m.observed_totals()
        assert totals["ingest"]["rows"] > 0
        assert 0 < totals["ingest"]["txn_rows"] < totals["ingest"]["rows"]
    finally:
        mon.detach(spark, m)


def test_stream_static_enrichment_matches_batch(spark, fixture_dir):
    """Stream-static dim join (enrich_with_dim): per-batch join against
    a static dimension equals the batch computation — the routine CDC
    enrichment shape (broadcast dim, left join, no state)."""
    from realtime_banking_cdc_pipeline_spark.streaming.analytics import (
        enrich_with_dim,
    )

    dim = spark.createDataFrame(
        [
            ("banking.public.customers", "gold"),
            ("banking.public.accounts", "silver"),
            ("banking.public.transactions", "bronze"),
        ],
        "topic string, sla_class string",
    )
    stream = read_fixture_stream(spark, fixture_dir)
    agg = (
        enrich_with_dim(stream, dim, on="topic", how="left")
        .groupBy("sla_class")
        .count()
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("enrich_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["sla_class"]: r["count"]
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    batch = spark.read.json(fixture_dir)
    want = {
        r["sla_class"]: r["count"]
        for r in batch.join(dim, on="topic", how="left")
        .groupBy("sla_class")
        .count()
        .collect()
    }
    assert got == want and len(got) > 0
