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


# ---------------------------------------------------------------------------
# Count-Min sketch cells (shared by queries/round7b.py:x_cms_heavy_hitters
# and the streaming heavy-hitters monitor, streaming/metrics.py)
# ---------------------------------------------------------------------------

CMS_D = 4  # depth (independent md5-salted hash rows)
CMS_W = 256  # width (counters per row)


def cms_col_idx(term: Column, row: Column) -> Column:
    """Deterministic column index of ``term`` in salt row ``row`` —
    28 md5 bits mod CMS_W, exactly replayable by the DuckDB oracle
    (queries/round7b.py generates the same expression)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"), row.cast("string"),
                        F.lit(":"), term,
                    ).cast("binary")
                ),
                1, 7,
            ),
            16, 10,
        ).cast("long")
        % CMS_W
    )


def cms_cells(
    df: DataFrame, term_col: str, weight_col: str | None = None
) -> DataFrame:
    """(row_idx, col_idx, cnt) Count-Min cell table over the term
    stream (or a pre-contracted (term, weight) table) — one map-side-
    combinable sum agg; at most CMS_D x CMS_W rows out regardless of
    input size. Cells are ADDITIVE: summing per-batch cell tables
    equals the cells of the concatenated stream (the streaming-fold
    property — the exactly-once contract differs from HLL's, see
    streaming/metrics.py)."""
    w = (F.col(weight_col) if weight_col is not None else F.lit(1)).alias(
        "__w"
    )
    idx = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i")
    return (
        df.select(F.col(term_col).alias("__t"), w, idx)
        .select(
            F.col("i").alias("row_idx"),
            cms_col_idx(F.col("__t"), F.col("i")).alias("col_idx"),
            "__w",
        )
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def merge_cms_cells(*tables: DataFrame) -> DataFrame:
    """Fold cell tables: union + per-(row, col) SUM. Associative and
    commutative but NOT idempotent — folding the same batch twice
    double-counts, which is why the streaming store keys batches by
    epoch partition (a replay overwrites its own partition) instead of
    relying on merge idempotence the way the HLL store does."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("row_idx", "col_idx").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_estimates(cells: DataFrame, terms: DataFrame, term_col: str = "term") -> DataFrame:
    """Point estimates (term, cms_estimate) = min over the CMS_D probed
    cells — the one-sided (estimate >= truth) Count-Min read. The cell
    table is broadcast-sized by construction (<= CMS_D x CMS_W rows)."""
    idx = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i")
    probes = terms.select(F.col(term_col).alias("term"), idx).select(
        "term",
        F.col("i").alias("row_idx"),
        cms_col_idx(F.col("term"), F.col("i")).alias("col_idx"),
    )
    return (
        probes.join(F.broadcast(cells), ["row_idx", "col_idx"])
        .groupBy("term")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# DDSketch-style quantile bins (shared by queries/round8c.py:
# x_ddsketch_quantiles and the streaming quantile monitor,
# streaming/metrics.py). Integer geometry: unit bins below 32, then 16
# sub-buckets per power of two -> bin width 1/16 of the value, i.e. a
# guaranteed <= 6.25% relative error at any quantile. State is a pure
# ADDITIVE histogram (merge = sum counts), the property exact
# sort-based percentiles lack at scale.
# ---------------------------------------------------------------------------

DDS_SUB_BITS = 4  # mantissa bits kept -> 16 sub-buckets per octave


def dds_bins(df: DataFrame, value_col: str, key_cols: list | None = None) -> DataFrame:
    """(key..., idx, cnt) additive histogram of a non-negative integer
    column. Output is at most a few hundred rows per key regardless of
    input size (16 bins per octave x ~60 octaves).

    Negative values are FILTERED here rather than trusted to the
    caller's ``value_expr``: ``bin(v)`` of a negative bigint is the
    64-char two's-complement string, so e=64 and the shift arithmetic
    would emit meaningless indices that silently corrupt the additive
    histogram. Dropping them keeps every representable bin exact
    (0..31 are unit bins) and makes a bad expression degrade visibly
    (missing mass) instead of skewing all downstream quantiles."""
    keys = key_cols or []
    b = df.select(
        *keys, F.col(value_col).cast("bigint").alias("v")
    ).filter(F.col("v") >= 0).withColumn("e", F.length(F.bin("v")))
    idx = F.when(F.col("e") <= 5, F.col("v")).otherwise(
        F.lit(16) * F.col("e")
        + F.expr(
            "(v - (cast(1 as bigint) << cast(e - 1 as int)))"
            " div (cast(1 as bigint) << cast(e - 5 as int))"
        )
    )
    return (
        b.select(*keys, idx.cast("long").alias("idx"))
        .groupBy(*keys, "idx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def merge_dds_bins(*tables: DataFrame) -> DataFrame:
    """Fold histograms: union + per-(key..., idx) count sum. ADDITIVE —
    replaying a batch double-counts, so streaming consumers must use
    epoch-keyed partitions (the CMS exactly-once regime, not HLL's)."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def dds_quantiles(hist: DataFrame, q_pcts: list) -> DataFrame:
    """(q_pct, est) lower-bound quantile estimates from a folded
    single-key histogram (columns idx, cnt): est = lower bound of the
    first bin whose cumulative count reaches ceil(q*N/100)."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("idx").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    n = hist.agg(F.sum("cnt").cast("long").alias("n"))
    qs = spark.createDataFrame([(int(q),) for q in q_pcts], "q_pct int")
    targets = n.join(F.broadcast(qs)).withColumn(
        "k", F.expr("(q_pct * n + 99) div 100")
    )
    est = (
        targets.join(cum, F.col("cum") >= F.col("k"))
        .groupBy("q_pct", "n")
        .agg(F.min("idx").alias("idx"))
    )
    lb = (
        "CASE WHEN idx <= 31 THEN idx"
        " ELSE (cast(1 as bigint) << cast(idx div 16 - 1 as int))"
        " + (idx % 16) * (cast(1 as bigint) << cast(idx div 16 - 5 as int))"
        " END"
    )
    return est.selectExpr(
        "cast(q_pct as int) as q_pct", "n", f"cast({lb} as bigint) as est"
    )


# ---------------------------------------------------------------------------
# Bloom filter words (shared salt scheme with queries/round7b.py:
# x_bloom_decontaminate; consumed by the streaming seen-set dedup gate,
# streaming/metrics.py). Merge is bitwise OR — associative, commutative
# and IDEMPOTENT, the same exactly-once class as HLL max-merge.
# ---------------------------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_WORDS = BLOOM_BITS // 32  # 32-bit words: shifts stay < 31
BLOOM_K = 4


def bloom_words(
    df: DataFrame, text_col: str, bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """(word_idx, bits) filter words for the DISTINCT values of
    ``text_col`` — at most ``bits // 32`` rows regardless of input
    size. Size ``bits`` ~ 10x the expected distinct count for a ~1% fp
    rate (production seen-sets pass a larger value; the 4096 default
    matches the batch decontamination fixture)."""
    idx = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i")
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bloom"), F.col("i").cast("string"),
                        F.lit(":"), F.col(text_col),
                    ).cast("binary")
                ),
                1, 7,
            ),
            16, 10,
        ).cast("long")
        % bits
    )
    return (
        df.select(F.col(text_col)).distinct()
        .select(idx, text_col)
        .select(pos.alias("pos"))
        .distinct()
        .groupBy(F.expr("pos div 32").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))")
            ).alias("bits")
        )
    )


def merge_bloom_words(*tables: DataFrame) -> DataFrame:
    """Fold word tables: union + per-word bit_or. Idempotent — a
    replayed batch ORs to the identical filter."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_maybe_member(
    df: DataFrame, id_col: str, text_col: str, words: DataFrame,
    bits: int = BLOOM_BITS, k: int = BLOOM_K,
) -> DataFrame:
    """(id, maybe_member) one-sided membership probe (``bits``/``k``
    must match the words' build parameters): true members are ALWAYS
    flagged; non-members flag at the fp rate. The filter side
    broadcasts (<= bits // 32 rows).

    Duplicate (id, text) rows are collapsed before the k-way probe
    explosion — without this a duplicated row yields 2k probe rows and
    ``sum(set_bit) = 2k != k``, silently reporting a genuinely seen
    text as maybe_member=false (breaking the one-sided guarantee)."""
    df = df.dropDuplicates([id_col, text_col])
    idx = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i")
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bloom"), F.col("i").cast("string"),
                        F.lit(":"), F.col(text_col),
                    ).cast("binary")
                ),
                1, 7,
            ),
            16, 10,
        ).cast("long")
        % bits
    )
    probe = df.select(F.col(id_col), F.col(text_col)).select(
        id_col, idx, F.col(text_col)
    ).select(id_col, pos.alias("pos"))
    mask = F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))")
    return (
        probe.join(
            F.broadcast(words),
            F.expr("pos div 32") == F.col("word_idx"),
            "left_outer",
        )
        .select(
            id_col,
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(mask) == mask),
                1,
            )
            .otherwise(0)
            .alias("set_bit"),
        )
        .groupBy(id_col)
        .agg((F.sum("set_bit") == k).alias("maybe_member"))
    )


def bloom_fill_stats(
    words: DataFrame, bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """One-row health report for a folded (word_idx, bits) filter:
    ``set_bits`` (popcount over every word), ``fill_frac`` = set/total,
    ``est_fp`` = fill^k (the probability a FRESH text probes k set
    bits — i.e. the silent-drop rate of a gate built on this filter),
    and ``est_distinct`` = -(m/k)·ln(1-fill), the standard occupancy
    inversion for the number of distinct keys inserted (null once the
    filter is fully saturated — the inversion diverges). Cheap by
    construction: the words table is at most ``bits // 32`` rows.
    ADVICE r10: a saturated exact gate silently drops every fresh doc;
    this is the detector the gate and the ops read-path surface."""
    agg = words.agg(
        F.coalesce(F.sum(F.bit_count(F.col("bits"))), F.lit(0))
        .cast("long")
        .alias("set_bits")
    )
    fill = F.col("set_bits") / F.lit(float(bits))
    return agg.select(
        "set_bits",
        fill.alias("fill_frac"),
        F.pow(fill, F.lit(k)).alias("est_fp"),
        F.when(
            F.col("set_bits") < bits,
            -F.lit(float(bits) / k) * F.log(F.lit(1.0) - fill),
        ).alias("est_distinct"),
    )
