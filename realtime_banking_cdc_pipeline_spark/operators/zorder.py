"""Z-order (Morton) multi-dimensional clustering for data skipping.

The reference clusters its fact by (transaction_date, account_id) and
claims ~70% partition pruning (readme.md:134-140). Snowflake's linear
clustering key helps the leading column only; Z-ORDER interleaves the
bits of several columns so parquet min/max footer stats stay narrow in
EVERY dimension — the same trick as Delta's OPTIMIZE ZORDER BY, built
here from plain Spark primitives:

    bucket each column to [0, 2^bits) → interleave bits (pure JVM
    bitwise expressions) → repartitionByRange on the code →
    sortWithinPartitions → write.

Scale shape: one cheap min/max agg per column (parquet footer read),
one range shuffle on the code (Spark samples ranges, so output files
are even-sized), and the write. No UDFs, no driver data movement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already bucketed,
    non-negative) integer column: output bit (b * n + i) = bit b of
    column i. n * bits must fit in 63 bits."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long")
    parts = []
    for i, c in enumerate(cols):
        c = c.cast("long")
        for b in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return reduce(lambda a, x: a + x, parts).cast("long")


def _bucketize(df: DataFrame, col: str, bits: int) -> Column:
    """Quantile-bucket a numeric column to [0, 2^bits): rank-uniform
    buckets keep the downstream range-partition cuts aligned with code
    bit prefixes even on skewed data (min/max scaling does not — a
    heavy tail squeezes most rows into few buckets and the interleave
    loses its balance). One approxQuantile pass per column; the
    boundary array is emitted as plan literals."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    bounds = df.approxQuantile(col, probs, 0.001)
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    c = F.col(col).cast("double")
    return F.size(F.filter(barr, lambda b: c >= b)).cast("long")


def zorder_by(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Return ``df`` physically clustered by the Z-order of ``cols`` —
    write the result with ``maxRecordsPerFile`` and every file's
    min/max footer stats are narrow in all ``cols`` dimensions, so
    point/range filters on ANY of them skip most files.

    Partitioning ranges on the code PREFIX (⌊log2(partitions)⌋ top
    bits), not the raw code: sampled range cuts on the raw code land
    mid-block, so every file would straddle two Z-blocks and double its
    span in each dimension. Prefix values are discrete, so the cuts
    align with block boundaries."""
    import math

    code = morton_code([_bucketize(df, c, bits) for c in cols], bits)
    n_part = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    prefix_bits = max(int(math.log2(max(n_part, 2))), 1)
    total_bits = len(cols) * bits
    prefix = F.shiftright(F.col("__zorder"), max(total_bits - prefix_bits, 0))
    return (
        df.withColumn("__zorder", code)
        .repartitionByRange(n_part, prefix, F.col("__zorder"))
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )
