"""Schema evolution for long-lived CDC pipelines.

The reference pins one schema end-to-end (postgres/schema.sql) and
would break the day a column is added upstream — Debezium just starts
emitting the new field. Two Spark-native tools close that gap:

- ``read_merged``: parquet ``mergeSchema`` union over files written at
  different schema versions (old files yield nulls for new columns).
- ``align_to_schema``: reconcile any batch to a target StructType —
  missing columns null-filled, extra columns dropped (loudly if asked),
  matching columns cast. This is what lets yesterday's checkpointed
  state union with today's widened batch.

Scale notes: mergeSchema reads every file footer at planning time —
fine per-partition, expensive over millions of files; production pins
the merged schema in a catalog and uses ``align_to_schema`` at read
instead, which is a zero-cost projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("mergeSchema", "true").parquet(path)


def align_to_schema(
    df: DataFrame, target: T.StructType, strict_extras: bool = False
) -> DataFrame:
    """Project ``df`` onto ``target``: add missing columns as typed
    nulls, cast matching ones, drop extras (or raise when
    ``strict_extras``). Column order follows ``target``."""
    have = {f.name: f for f in df.schema.fields}
    extras = [n for n in have if n not in {f.name for f in target.fields}]
    if extras and strict_extras:
        raise ValueError(f"unexpected columns {extras} not in target schema")
    cols = []
    for field in target.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
