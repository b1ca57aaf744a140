"""Columnar parquet IO.

The reference stages Bronze as hive-partitioned parquet on object
storage (``consumer/kafka_to_minio.py:41-51``) and bulk-loads with
``COPY INTO ... ON_ERROR='CONTINUE'``
(``docker/dags/minio_to_snowflake_dag.py:73-84``). Spark reads the same
layout natively with partition discovery, predicate pushdown and
vectorized decoding; error-tolerant load maps to PERMISSIVE mode with a
corrupt-record quarantine column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md layout)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink (reference S5: ``{table}/date=.../*.parquet``).

    ``maxRecordsPerFile`` bounds file size so a 100 TB table does not
    produce multi-GB row groups; partition columns drive pruning at read
    time exactly like the reference's Snowflake clustering keys
    (readme.md:134-140).
    """
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def compact_parquet(
    spark: SparkSession, path: str, target_records_per_file: int = 1_000_000
) -> int:
    """Rewrite a parquet table into ⌈rows / target⌉ evenly-sized files —
    the maintenance pass every incremental sink needs (per-batch appends
    accumulate small files; small files mean per-file open/footer costs
    dominate scans and executors starve on tiny splits). Staging
    double-write because the read and the overwrite share ``path``.
    Returns the resulting file count. On Delta/Iceberg this is OPTIMIZE;
    here it is the same operation on plain parquet."""
    df = spark.read.parquet(path)
    n = df.count()
    files = max(1, -(-n // target_records_per_file))
    tmp = path.rstrip("/") + "__compact"
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    back = spark.read.parquet(tmp)
    back.write.mode("overwrite").parquet(path)
    _delete_path(spark, tmp)
    return files


def _delete_path(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")


def write_any(df: DataFrame, path: str, fmt: str = "parquet",
              mode: str = "overwrite") -> None:
    """Format-agnostic sink. Parquet/ORC carry their own schema; CSV
    writes a header (and the reader below re-applies the exact schema —
    CSV's types are lossy on disk by nature)."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"format {fmt!r} not in {SUPPORTED_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat",
                                              "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    w.save(path)


def read_any(spark: SparkSession, path: str, fmt: str = "parquet",
             schema=None) -> DataFrame:
    """Format-agnostic source: columnar formats self-describe; text
    formats (json/csv) take the explicit schema the caller owns —
    schema inference at 100 TB means scanning the data twice."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"format {fmt!r} not in {SUPPORTED_FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat",
                                              "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    return r.load(path)


def read_json_tolerant(spark: SparkSession, path: str, schema) -> DataFrame:
    """PERMISSIVE JSON read with corrupt-record quarantine — the Spark
    equivalent of ``ON_ERROR='CONTINUE'`` (minio_to_snowflake_dag.py:81)."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
