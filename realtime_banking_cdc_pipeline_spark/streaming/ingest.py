"""Structured Streaming ingestion (SURVEY.md §3.1 re-architecture).

The reference's steps 2-6 (Debezium → Kafka → consumer → MinIO → COPY)
collapse into one streaming query per topic group:

    readStream (kafka | file fixture) → envelope normalize →
    watermark + dropDuplicatesWithinWatermark → foreachBatch(merge)

Checkpointing gives exactly-once into the Bronze store — strictly
stronger than the reference's auto-commit consumer (whose
committed-but-unflushed buffer loses events on crash,
kafka_to_minio.py:21-22,54) and its every-minute re-COPY duplication
(minio_to_snowflake_dag.py:41-49).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# File-fixture framing carries ts as epoch-ms (fixtures.write_fixture_json)
_FIXTURE_JSON_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), False),
        T.StructField("ts", T.LongType(), True),
    ]
)


def kafka_source_options(
    bootstrap: str, topics: list[str], starting_offsets: str = "earliest"
) -> dict[str, str]:
    """Source-option contract for the multi-topic Kafka reader (S2) —
    the subscribe list mirrors the reference's Debezium topic set
    (consumer/kafka_to_minio.py:15-24, topics from
    generate_and_post_connector.py:23-24). Pure so the contract is
    testable without the spark-sql-kafka jar."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
    }


def read_kafka_stream(
    spark: SparkSession, bootstrap: str, topics: list[str],
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Multi-topic Kafka source (S2). Requires the spark-sql-kafka jar on
    the classpath — absent in this container, so tests use the file
    fixture source below; the downstream plan is identical."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap, topics, starting_offsets).items():
        reader = reader.option(k, v)
    return reader.load().select(
        F.col("topic"),
        F.col("key").cast("string"),
        F.col("value").cast("string"),
        F.col("timestamp").alias("ts"),
    )


def read_fixture_stream(spark: SparkSession, path: str) -> DataFrame:
    """Kafka-framed JSONL fixture as a streaming source (one row per CDC
    message, FIXTURES.md §2 file-fixture form)."""
    raw = spark.readStream.schema(_FIXTURE_JSON_SCHEMA).json(path)
    return raw.select(
        "topic", "key", "value", F.timestamp_millis(F.col("ts")).alias("ts")
    )


def with_stream_dedup(frames: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """In-stream absorption of at-least-once redelivery: watermark on the
    event time + dropDuplicatesWithinWatermark on (topic, key, value).
    Replaces the reference's query-time-only dedup (SURVEY.md §2.8);
    state is bounded by the watermark TTL."""
    return frames.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["topic", "key", "value"]
    )


def start_pipeline_stream(
    spark: SparkSession,
    frames: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Drive the medallion pipeline from a stream via foreachBatch —
    each micro-batch runs the same deterministic batch functions
    (plans/medallion.py), so batch and streaming share one code path."""
    writer = (
        frames.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
