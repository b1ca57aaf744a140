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
    dominate scans and executors starve on tiny splits). Writes to a
    staging dir (the read and the rewrite share ``path``), then promotes
    it with the rename-based ``swap_into_place``. Returns the resulting
    file count. On Delta/Iceberg this is OPTIMIZE; here it is the same
    operation on plain parquet."""
    df = spark.read.parquet(path)
    n = df.count()
    files = max(1, -(-n // target_records_per_file))
    tmp = path.rstrip("/") + "__staging"
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    swap_into_place(spark, tmp, path)
    return files


def _fs(spark: SparkSession, path: str):
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def swap_into_place(spark: SparkSession, staging: str, path: str) -> None:
    """Promote a fully-written ``staging`` dir to ``path`` via two
    renames, keeping the previous table as ``<path>__old`` until the
    new one is in place — replaces the overwrite-in-place rewrite whose
    crash window TRUNCATED the target (r2 advisor finding).

    Crash matrix: before the first rename the old table is untouched;
    between the renames the path is briefly absent but BOTH copies
    exist on disk; after the second rename the swap is durable and
    ``__old`` is garbage. ``recover_swap`` repairs every intermediate
    state. Renames are atomic metadata ops on HDFS/local/ABFS; on S3
    "rename" is copy+delete, so there a transactional table format
    (Delta/Iceberg — see ``plans.materialize.try_delta_merge``) is the
    real answer."""
    fs, hstaging = _fs(spark, staging)
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    hold = spark._jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
    fs.delete(hold, True)
    had_old = fs.exists(hpath)
    if had_old and not fs.rename(hpath, hold):
        raise IOError(f"swap: could not retire {path}")
    if not fs.rename(hstaging, hpath):
        # put the old table back rather than leaving the path empty
        if had_old:
            fs.rename(hold, hpath)
        raise IOError(f"swap: could not promote {staging} to {path}")
    fs.delete(hold, True)


def recover_swap(spark: SparkSession, path: str) -> str:
    """Repair an interrupted ``swap_into_place``. Returns what happened:
    ``"intact"`` (target present — leftover staging/old cleaned),
    ``"promoted_staging"`` (crash between renames; the NEW data was
    complete, promote it), ``"restored_old"`` (staging incomplete or
    missing; old table restored), or ``"missing"`` (nothing to recover).
    Idempotent — safe to call at every job start."""
    fs, hpath = _fs(spark, path)
    hstaging = spark._jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__staging")
    hold = spark._jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
    if fs.exists(hpath):
        fs.delete(hstaging, True)
        fs.delete(hold, True)
        return "intact"
    # a staging dir is only promotable if its write COMMITTED (_SUCCESS)
    hsuccess = spark._jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "__staging/_SUCCESS"
    )
    if fs.exists(hstaging) and fs.exists(hsuccess):
        fs.rename(hstaging, hpath)
        fs.delete(hold, True)
        return "promoted_staging"
    if fs.exists(hold):
        fs.rename(hold, hpath)
        fs.delete(hstaging, True)
        return "restored_old"
    return "missing"


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


def read_csv_tolerant(
    spark: SparkSession, path: str, schema, header: bool = True
) -> DataFrame:
    """PERMISSIVE CSV read with corrupt-record quarantine — the same
    ``ON_ERROR='CONTINUE'`` contract as :func:`read_json_tolerant`
    (minio_to_snowflake_dag.py:81) for delimited landings. Malformed
    rows surface in ``_corrupt_record`` instead of failing the load."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
