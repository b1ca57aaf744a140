"""Round-8 late batch (reference analog: the reference's compute is
dbt/Snowflake marts, `models/`; these extend the engine surface the
survey calls for):

- x_audio_mulaw_stats — REAL G.711 mu-law decode (ITU-T G.711): a
  second, genuinely different audio codec beyond PCM-16, expanded
  through the exact integer segment/mantissa map with the oracle
  replaying the same closed-form expansion in SQL.
- x_zorder_layout — Morton/Z-order data-layout scorecard: the
  OPTIMIZE-ZORDER file-skipping pattern (interleave two clustering
  dims, range-split the curve into files, report per-file min/max
  extents — exactly the footer stats a 100 TB scan prunes on) with a
  linear-layout baseline in the same result so the bounding-box win
  is visible in the data.
- x_hll_overlap — cross-source distinct-overlap estimation by HLL
  inclusion-exclusion: per-source register tables are max-merged per
  pair (the mergeability that makes HLL the 100 TB sketch), the
  exact overlap rides along as the error scorecard.

Determinism follows queries/_det.py house rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_io import read_table
from .llmdata import _docs
from .registry import query

# ---------------------------------------------------------------------------
# x_audio_mulaw_stats — REAL G.711 mu-law expansion under the hash gate
# ---------------------------------------------------------------------------

_MULAW_N = "400 + doc_id % 200"

# The G.711 expansion in pure integer SQL (DuckDB side): complement the
# byte, mantissa<<3 + 0x84 bias, shift by the 3-bit segment, re-sign.
# Identical op order to functions/multimodal.py:_mulaw_decode_table.
_XMULAW_SQL = f"""
WITH m AS (
  SELECT doc_id, {_MULAW_N} AS n FROM documents
),
b AS (
  SELECT doc_id, n,
         (doc_id * 13 + unnest(generate_series(0, n - 1)) * 7) % 256 AS byte
  FROM m
),
u AS (SELECT doc_id, n, 255 - byte AS u FROM b),
t AS (
  SELECT doc_id, n, u,
         ((u % 16) * 8 + 132) << ((u // 16) % 8) AS t
  FROM u
),
d AS (
  SELECT doc_id, n,
         CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END AS v
  FROM t
)
SELECT doc_id AS media_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS channels,
       CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(MAX(abs(v)) AS BIGINT) AS peak
FROM d GROUP BY doc_id, n
"""


@query(
    "x_audio_mulaw_stats",
    _XMULAW_SQL,
    doc=(
        "REAL G.711 mu-law audio decode, no codec library: "
        "deterministic mu-law WAV payloads (format code 7, 8-bit "
        "samples, byte k = (id*13+k*7) % 256) are synthesized per doc "
        "and expanded through the exact ITU-T G.711 integer map "
        "(complement, mantissa<<3 + 0x84, segment shift, re-sign — "
        "functions/multimodal.py:_mulaw_decode_table) inside "
        "mapInPandas; the oracle regenerates the byte stream and "
        "replays the same closed-form expansion in SQL, so a single "
        "wrong bit in the expansion breaks the hash gate. A genuinely "
        "different codec from the PCM-16 twin (x_audio_decode): "
        "logarithmic companding vs linear samples. Payloads never "
        "shuffle; 7 small columns out per clip — the 100 TB media "
        "posture (move features, not bytes)."
    ),
)
def x_audio_mulaw_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from ..functions.multimodal import (
        extract_audio_features,
        synthesize_wav_mulaw,
    )

    def _make(mid, n):
        return pd.Series(
            [synthesize_wav_mulaw(int(m), int(k)) for m, k in zip(mid, n)]
        )

    make = pandas_udf(_make, "binary", PandasUDFType.SCALAR)

    d = _docs(spark, sf_dir).select(F.col("doc_id").alias("media_id"))
    media = d.select(
        "media_id",
        make(
            F.col("media_id"),
            F.expr(_MULAW_N.replace("doc_id", "media_id")).cast("int"),
        ).alias("payload"),
    )
    return extract_audio_features(media)


# ---------------------------------------------------------------------------
# x_zorder_layout — Morton-curve file layout vs linear baseline
# ---------------------------------------------------------------------------

_Z_BITS = 6  # 6 bits per dimension -> 12-bit Morton code, 64 files
_Z_FILES = 64


def _bit_interleave_sql(cx: str, cy: str, intdiv: str = "//") -> str:
    """The 12-bit Morton interleave as plain integer arithmetic
    (bit i of cx -> position 2i, bit i of cy -> 2i+1) — the same
    term structure on both engines, no engine bit ops. ``intdiv`` is
    the only dialect split (DuckDB ``//`` floors, Spark ``div``
    truncates — identical on these nonnegative operands)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({cx} {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({cy} {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_XZORDER_SQL = f"""
WITH base AS (
  SELECT o_custkey % {1 << _Z_BITS} AS cx,
         (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % {1 << _Z_BITS}
           AS cy
  FROM orders
),
coded AS (
  SELECT cx, cy, {_bit_interleave_sql("cx", "cy")} AS morton FROM base
),
assigned AS (
  SELECT 'zorder' AS layout, morton // {_Z_FILES} AS file_id, cx, cy
  FROM coded
  UNION ALL
  SELECT 'linear' AS layout, (cx * {1 << _Z_BITS} + cy) // {_Z_FILES}
           AS file_id, cx, cy
  FROM coded
)
SELECT layout, CAST(file_id AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS rows_in_file,
       CAST(MIN(cx) AS BIGINT) AS min_cx,
       CAST(MAX(cx) AS BIGINT) AS max_cx,
       CAST(MIN(cy) AS BIGINT) AS min_cy,
       CAST(MAX(cy) AS BIGINT) AS max_cy,
       CAST((MAX(cx) - MIN(cx) + 1) * (MAX(cy) - MIN(cy) + 1) AS BIGINT)
         AS bbox_area
FROM assigned GROUP BY layout, file_id
"""


@query(
    "x_zorder_layout",
    _XZORDER_SQL,
    bench=True,
    doc=(
        "Z-order (Morton-curve) data-layout scorecard — the OPTIMIZE "
        "ZORDER / file-skipping pattern: two clustering dimensions "
        "(customer bucket x epoch-day bucket) are bit-interleaved into "
        "a 12-bit Morton code, the curve is range-split into 64 equal "
        "code windows (= files), and each file reports its row count "
        "and min/max extents in BOTH dims — exactly the parquet footer "
        "stats a predicate scan prunes on. A row-major linear layout "
        "of the same rows rides along as the baseline: its files span "
        "the full second dimension (bbox_area 64x the rows' true "
        "spread) while Z-order files stay bounded in both dims, so "
        "the pruning win is visible in the result rows themselves. "
        "Scale: the whole op is a 2-column projection + literal "
        "integer bit arithmetic + one groupBy — at 100 TB the "
        "assignment becomes repartitionByRange(morton) before the "
        "writer, and the extents table IS the skipping index; no "
        "shuffle beyond the final 128-group agg."
    ),
)
def x_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    side = 1 << _Z_BITS
    base = o.select(
        (F.col("o_custkey") % side).alias("cx"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            % side
        ).alias("cy"),
    )
    coded = base.select(
        "cx",
        "cy",
        F.expr(_bit_interleave_sql("cx", "cy", intdiv="div")).alias(
            "morton"
        ),
    )
    assigned = coded.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"morton div {_Z_FILES}").cast("long").alias("file_id"),
        "cx",
        "cy",
    ).unionByName(
        coded.select(
            F.lit("linear").alias("layout"),
            F.expr(f"(cx * {side} + cy) div {_Z_FILES}")
            .cast("long")
            .alias("file_id"),
            "cx",
            "cy",
        )
    )
    return assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("long").alias("rows_in_file"),
        F.min("cx").cast("long").alias("min_cx"),
        F.max("cx").cast("long").alias("max_cx"),
        F.min("cy").cast("long").alias("min_cy"),
        F.max("cy").cast("long").alias("max_cy"),
        (
            (F.max("cx") - F.min("cx") + 1) * (F.max("cy") - F.min("cy") + 1)
        )
        .cast("long")
        .alias("bbox_area"),
    )


# ---------------------------------------------------------------------------
# x_hll_overlap — pairwise distinct overlap via register max-merge
# ---------------------------------------------------------------------------

from .round7b import _HLL_M, _HLL_NUM, _HLL_SCALE, _HLL_W  # noqa: E402

_XHLLOV_SQL = f"""
WITH h AS (
  SELECT source,
         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS hv
  FROM documents
),
b AS (
  SELECT source, hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w FROM h
),
r AS (
  SELECT source, bucket,
         MAX(CASE WHEN w = 0 THEN {_HLL_W + 1}
                  ELSE {_HLL_W} - length(bin(w)) + 1 END) AS m_j
  FROM b GROUP BY 1, 2
),
est AS (
  SELECT source,
         CAST(floor({_HLL_NUM!r} /
              (CAST(SUM(1::BIGINT << CAST({_HLL_SCALE} - m_j AS INTEGER))
                    AS DOUBLE)
               + CAST({_HLL_M} - COUNT(*) AS DOUBLE)
                 * {float(1 << _HLL_SCALE)!r})) AS BIGINT) AS e
  FROM r GROUP BY source
),
pairs AS (
  SELECT a.source AS sa, bb.source AS sb
  FROM (SELECT DISTINCT source FROM documents) a
  JOIN (SELECT DISTINCT source FROM documents) bb ON a.source < bb.source
),
pu AS (
  SELECT p.sa, p.sb, r.bucket, MAX(r.m_j) AS m_j
  FROM pairs p JOIN r ON r.source = p.sa OR r.source = p.sb
  GROUP BY 1, 2, 3
),
uest AS (
  SELECT sa, sb,
         CAST(floor({_HLL_NUM!r} /
              (CAST(SUM(1::BIGINT << CAST({_HLL_SCALE} - m_j AS INTEGER))
                    AS DOUBLE)
               + CAST({_HLL_M} - COUNT(*) AS DOUBLE)
                 * {float(1 << _HLL_SCALE)!r})) AS BIGINT) AS est_union
  FROM pu GROUP BY sa, sb
),
exact AS (
  SELECT ta.source AS sa, tb.source AS sb,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT DISTINCT source, md5(text) AS d FROM documents) ta
  JOIN (SELECT DISTINCT source, md5(text) AS d FROM documents) tb
    ON ta.d = tb.d AND ta.source < tb.source
  GROUP BY 1, 2
)
SELECT p.sa, p.sb,
       CAST(COALESCE(x.n, 0) AS BIGINT) AS exact_overlap,
       ea.e AS est_a,
       eb.e AS est_b,
       u.est_union,
       CAST(GREATEST(ea.e + eb.e - u.est_union, 0) AS BIGINT)
         AS est_overlap
FROM pairs p
LEFT JOIN exact x ON x.sa = p.sa AND x.sb = p.sb
JOIN est ea ON ea.source = p.sa
JOIN est eb ON eb.source = p.sb
JOIN uest u ON u.sa = p.sa AND u.sb = p.sb
"""


@query(
    "x_hll_overlap",
    _XHLLOV_SQL,
    doc=(
        "Cross-source distinct-overlap estimation by HLL inclusion-"
        "exclusion: |A intersect B| ~= est(A) + est(B) - est(A union B), "
        "where est(A union B) needs NO re-scan of the data — union "
        "registers are the per-pair MAX of the per-source register "
        "tables (functions/sketches.py:hll_registers), the "
        "mergeability that makes HLL the 100 TB sketch (64 longs per "
        "source forever; P pairwise unions cost P x 64 register rows, "
        "never a second corpus pass). The exact pairwise overlap "
        "(distinct texts present in both sources) rides along as the "
        "error scorecard, same pattern as x_cms_calibration / "
        "x_ann_recall_eval: every approximate structure ships with a "
        "measured-quality query. Estimates use the raw harmonic mean "
        "in 2^55 fixed point with exactly one trailing double "
        "division (x_hll_distinct's proven determinism recipe)."
    ),
)
def x_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sketches import hll_registers

    d = read_table(spark, sf_dir, "documents").select("source", "text")
    r = hll_registers(d, "source", "text").withColumnRenamed(
        "key", "source"
    )

    def estimate(regs: DataFrame, keys: list) -> DataFrame:
        s = regs.groupBy(*keys).agg(
            F.sum(
                F.expr(
                    f"shiftleft(cast(1 as bigint),"
                    f" cast({_HLL_SCALE} - m_j as int))"
                )
            )
            .cast("long")
            .alias("sum_fp"),
            F.count(F.lit(1)).cast("long").alias("used"),
        )
        e = F.floor(
            F.lit(_HLL_NUM)
            / (
                F.col("sum_fp").cast("double")
                + (F.lit(_HLL_M) - F.col("used")).cast("double")
                * F.lit(float(1 << _HLL_SCALE))
            )
        ).cast("bigint")
        return s.select(*keys, e.alias("e"))

    est = estimate(r, ["source"])
    srcs = d.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .join(
            srcs.select(F.col("source").alias("sb")),
            F.col("sa") < F.col("sb"),
        )
    )
    # union registers per pair: each pair pulls both sources' register
    # rows (two tiny equi-joins, no OR-join) and max-merges per bucket
    left = pairs.join(r, F.col("source") == F.col("sa")).select(
        "sa", "sb", "bucket", "m_j"
    )
    right = pairs.join(r, F.col("source") == F.col("sb")).select(
        "sa", "sb", "bucket", "m_j"
    )
    pu = (
        left.unionByName(right)
        .groupBy("sa", "sb", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    uest = estimate(pu, ["sa", "sb"]).withColumnRenamed("e", "est_union")

    # md5 digests shuffle, never raw text (house rule): the exact-
    # overlap self-join keys on the 16-byte digest, identical equality
    # semantics to the text join under the repo-wide md5-as-identity
    # convention (the oracle joins the same digests)
    st = d.select(
        "source", F.md5(F.col("text").cast("binary")).alias("d")
    ).distinct()
    overlap = (
        st.select(F.col("source").alias("sa"), "d")
        .join(
            st.select(F.col("source").alias("sb"), "d"),
            ["d"],
        )
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )

    ea = est.select(F.col("source").alias("sa"), F.col("e").alias("est_a"))
    eb = est.select(F.col("source").alias("sb"), F.col("e").alias("est_b"))
    return (
        pairs.join(overlap, ["sa", "sb"], "left")
        .withColumn("exact_overlap", F.coalesce("exact_overlap", F.lit(0)))
        .join(ea, "sa")
        .join(eb, "sb")
        .join(uest, ["sa", "sb"])
        .select(
            "sa",
            "sb",
            "exact_overlap",
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
                F.lit(0),
            )
            .cast("bigint")
            .alias("est_overlap"),
        )
    )
