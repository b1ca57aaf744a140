"""Deterministic sketch primitives shared by the batch queries
(queries/round7b.py) and incremental/streaming consumers.

HLL registers are max-mergeable: max is associative, commutative and
idempotent, so folding per-batch register tables with a groupBy-max is
EXACTLY the batch sketch over the union — the property that makes HLL
the streaming distinct-count (state = m longs per group key, forever).
The md5-derived hash keeps every register a pure function of the data,
so the merged result is replayable by the DuckDB oracle and pinned by
the stream-vs-batch parity test (tests/test_round7_properties.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 64  # registers per group (6 bucket bits)
HLL_W = 54  # rank domain: 60 md5 bits minus the bucket bits


def hll_registers(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """(key, bucket, m_j) register table for the distinct count of
    ``value_col`` per ``key_col`` — one map-side-combinable max agg;
    output is at most ``HLL_M`` rows per key regardless of input size."""
    hv = F.conv(
        F.substring(F.md5(F.col(value_col).cast("binary")), 1, 15), 16, 10
    ).cast("long")
    b = df.select(
        F.col(key_col).alias("key"),
        (hv % HLL_M).alias("bucket"),
        F.expr(
            f"conv(substring(md5(cast({value_col} as binary)), 1, 15), 16, 10)"
            f" div {HLL_M}"
        ).cast("long").alias("w"),
    )
    rank = F.when(F.col("w") == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W) - F.length(F.bin("w")) + 1
    )
    return b.groupBy("key", "bucket").agg(F.max(rank).alias("m_j"))


def merge_hll_registers(*tables: DataFrame) -> DataFrame:
    """Fold register tables: union + per-(key, bucket) max. Associative
    and idempotent — replaying a batch changes nothing, which is the
    exactly-once story for a foreachBatch register store."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("key", "bucket").agg(F.max("m_j").alias("m_j"))
