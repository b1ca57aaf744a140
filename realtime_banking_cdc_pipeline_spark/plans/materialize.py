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
from ..sources.parquet_io import swap_into_place


def materialize_view(df: DataFrame, name: str) -> None:
    df.createOrReplaceTempView(name)


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check — works for any scheme (file/hdfs/s3a),
    unlike os.path.exists."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def fs_delete(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def materialize_table(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    via_staging: bool = False,
) -> None:
    """``via_staging=True`` writes the new table to a staging dir (a
    DataFrame whose lineage READS ``path`` cannot overwrite it in place)
    then promotes it with the rename-based ``swap_into_place`` — the
    previous table is retired to ``<path>__old`` and deleted only after
    the new one is in place, so a crash never leaves the path truncated
    (``recover_swap(path)`` repairs the brief both-copies-on-disk
    window). A transactional format (Delta/Iceberg) is the upgrade —
    that's the connector-mode path."""
    if via_staging:
        spark = df.sparkSession
        tmp = path.rstrip("/") + "__staging"
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(tmp)
        swap_into_place(spark, tmp, path)
        return
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
    semantics on plain parquet (idempotent under redelivery). Same
    staging write + rename swap as ``materialize_table``."""
    target = None
    if fs_exists(spark, path):
        target = spark.read.parquet(path)
    merged = incremental_merge(target, batch, unique_key, order_by=order_by or [])
    tmp = path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(tmp)
    swap_into_place(spark, tmp, path)
    return spark.read.parquet(path)


def try_delta_merge(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    unique_key: str,
):
    """Delta ``MERGE INTO`` connector — the transactional upgrade of
    ``materialize_incremental`` (closes its staging-rewrite crash window
    and makes the merge O(touched files) instead of full-rewrite).

    VERIFIED UNAVAILABLE in this container (round 2): ``import delta``
    raises ModuleNotFoundError, the delta-spark jar is not on the Spark
    classpath, and the environment forbids package installation — so
    this stays an import-gated stub rather than a fake. The parquet
    anti-join⊎append path implements identical MERGE semantics
    (tested: tests/test_materialize_stateful.py incremental cycle,
    tests/test_durable_gold.py cross-restart merge).

    When delta-spark IS present this executes the real MERGE:
    matched-by-key rows update, unmatched insert — byte-equivalent
    results to the parquet path by construction."""
    try:
        from delta.tables import DeltaTable
    except ImportError as e:
        raise NotImplementedError(
            "delta-spark not installed; use materialize_incremental (parquet)"
        ) from e
    if DeltaTable.isDeltaTable(spark, path):
        tgt = DeltaTable.forPath(spark, path)
        (
            tgt.alias("t")
            .merge(batch.alias("b"), f"t.{unique_key} = b.{unique_key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    else:
        batch.write.format("delta").save(path)
    return spark.read.format("delta").load(path)


def register_sources(spark: SparkSession, sf_dir: str, tables: list[str]) -> None:
    """S9 source declaration: bind testdata parquet into the session
    catalog (the sources.yaml → BANKING.RAW.* binding)."""
    for t in tables:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).createOrReplaceTempView(t)
