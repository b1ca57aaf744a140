"""Materialization modes (C5 in SURVEY.md §2.7) + catalog registration
(S9): the dbt view/table/incremental trichotomy mapped to Spark.

- view        → ``createOrReplaceTempView`` (zero-copy logical alias;
                Catalyst inlines + prunes through it — ``stg_*.sql:1``)
- table       → parquet ``saveAsTable``-style overwrite (CTAS; ``dim_*``)
- incremental → anti-join ⊎ batch merge on a unique key, persisted
                (``fact_transactions.sql:1``; Delta MERGE in connector
                mode — jar not in this container, gated import)

At scale, table/incremental writes partition by the declared columns so
reads prune (readme.md:134-140's clustering keys).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental import incremental_merge


def materialize_view(df: DataFrame, name: str) -> None:
    df.createOrReplaceTempView(name)


def materialize_table(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def materialize_incremental(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    unique_key: str,
    order_by: list[str] | None = None,
) -> DataFrame:
    """First run CTAS, then merge-on-unique-key — dbt incremental
    semantics on plain parquet (idempotent under redelivery)."""
    target = None
    if os.path.exists(path):
        target = spark.read.parquet(path)
    merged = incremental_merge(target, batch, unique_key, order_by=order_by or [])
    tmp = path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def try_delta_merge(*args, **kwargs):  # pragma: no cover - no delta jar in v1
    """Delta MERGE INTO connector — requires delta-spark on the
    classpath; gated so the parquet path above is the default."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "delta-spark not installed; use materialize_incremental (parquet)"
        ) from e


def register_sources(spark: SparkSession, sf_dir: str, tables: list[str]) -> None:
    """S9 source declaration: bind testdata parquet into the session
    catalog (the sources.yaml → BANKING.RAW.* binding)."""
    for t in tables:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).createOrReplaceTempView(t)
