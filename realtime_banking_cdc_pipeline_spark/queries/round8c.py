"""Round-8 closing batch (reference analog: the reference's compute is
dbt/Snowflake marts, `models/`; these extend the multimodal + sketch
surface the survey calls for):

- x_image_resize — REAL image downsample: decode (shared real PPM/BMP/
  PNG/GIF parser) + 2x2 integer box filter, the resize step of the
  decode / feature-extract / RESIZE / frame-sample multimodal quartet.
  Exact integer block means, so the oracle replays the filter
  analytically from the generative pixel formula.
- x_kmv_distinct — KMV (k-minimum-values / bottom-k) distinct sketch
  (Bar-Yossef et al. 2002): keep the k smallest distinct hash values
  per group; estimate D = (k-1) * H / h_k. A second mergeable
  distinct-estimator family beside HLL (union = merge-and-retake-k),
  with the exact count riding along as the error scorecard.

Determinism follows queries/_det.py house rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.similarity import md5_long
from .llmdata import _docs
from .registry import query

# ---------------------------------------------------------------------------
# x_image_resize — 2x2 box-filter downsample under the hash gate
# ---------------------------------------------------------------------------

_RSZ_W = "8 + 2 * (doc_id % 5)"   # 8..16, always even
_RSZ_H = "8 + 2 * (doc_id % 4)"   # 8..14, always even


def _rsz_channel_sql(c: int) -> str:
    """Integer mean of one 2x2 source block for channel ``c``: byte i
    of the PPM pixel stream is (doc_id + i) % 256 with i = 3*(y*w+x)+c
    (functions/multimodal.py:synthesize_ppm) — sum the four block
    bytes, floor-divide by 4 (identical op order to resize_image_box's
    blocks // 4)."""
    terms = " + ".join(
        f"((doc_id + 3 * ((y0 + {dy}) * w + x0 + {dx}) + {c}) % 256)"
        for dy in (0, 1)
        for dx in (0, 1)
    )
    return f"({terms}) // 4"


_XRESIZE_SQL = f"""
WITH m AS (
  SELECT doc_id, {_RSZ_W} AS w, {_RSZ_H} AS h FROM documents
),
op AS (
  SELECT doc_id, w, h,
         unnest(generate_series(0, (w // 2) * (h // 2) - 1)) AS j
  FROM m
),
px AS (
  SELECT doc_id, w, h,
         2 * (j % (w // 2)) AS x0, 2 * (j // (w // 2)) AS y0
  FROM op
),
v AS (
  SELECT doc_id, w, h,
         {_rsz_channel_sql(0)} AS vr,
         {_rsz_channel_sql(1)} AS vg,
         {_rsz_channel_sql(2)} AS vb
  FROM px
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(w // 2 AS INTEGER) AS out_width,
       CAST(h // 2 AS INTEGER) AS out_height,
       CAST(SUM(vr) AS BIGINT) AS sum_r,
       CAST(SUM(vg) AS BIGINT) AS sum_g,
       CAST(SUM(vb) AS BIGINT) AS sum_b
FROM v GROUP BY doc_id, w, h
"""


@query(
    "x_image_resize",
    _XRESIZE_SQL,
    doc=(
        "REAL image resize, no codec library: deterministic P6 PPM "
        "payloads are decoded by the shared real parser "
        "(functions/multimodal.py:decode_image_rgb) and downsampled by "
        "an exact-integer 2x2 box filter (block sum // 4 — bilinear at "
        "integer scale IS the box filter) inside mapInPandas; the "
        "oracle replays every output pixel analytically from the "
        "generative formula, so one wrong block boundary breaks the "
        "hash gate. Completes the multimodal quartet the survey names: "
        "decode (x_image_decode/png/gif), feature-extract "
        "(x_multimodal_features), RESIZE (this), frame-sample "
        "(x_video_framesample). Payloads never shuffle; 8 small "
        "columns out per image — at 100 TB the resize runs where the "
        "bytes already live and only features cross the wire."
    ),
)
def x_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from ..functions.multimodal import extract_image_resize, synthesize_ppm

    def _make_ppm(mid, w, h):
        return pd.Series(
            [synthesize_ppm(int(m), int(a), int(b)) for m, a, b in zip(mid, w, h)]
        )

    make_ppm = pandas_udf(_make_ppm, "binary", PandasUDFType.SCALAR)

    d = _docs(spark, sf_dir).select(F.col("doc_id").alias("media_id"))
    media = d.select(
        "media_id",
        make_ppm(
            F.col("media_id"),
            F.expr(_RSZ_W.replace("doc_id", "media_id")).cast("int"),
            F.expr(_RSZ_H.replace("doc_id", "media_id")).cast("int"),
        ).alias("payload"),
    )
    return extract_image_resize(media, factor=2)


# ---------------------------------------------------------------------------
# x_kmv_distinct — bottom-k (KMV) distinct sketch with exact scorecard
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_HEX = 15                       # 60-bit hash space
_KMV_H = float(16 ** _KMV_HEX)      # 2^60, exactly representable

_XKMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT source,
         CAST('0x' || substr(md5('kmv:' || text), 1, {_KMV_HEX}) AS BIGINT)
           AS hv
  FROM documents
),
r AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
  FROM h
),
s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS in_sketch,
         CAST(MAX(hv) AS BIGINT) AS kth_hash
  FROM r WHERE rk <= {_KMV_K} GROUP BY source
),
e AS (
  SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
  FROM documents GROUP BY source
)
SELECT s.source,
       CAST({_KMV_K} AS INTEGER) AS k,
       s.in_sketch,
       s.kth_hash,
       CAST(CASE WHEN s.in_sketch < {_KMV_K} THEN s.in_sketch
            ELSE floor({_KMV_K - 1}.0 * {_KMV_H!r} /
                       CAST(s.kth_hash AS DOUBLE)) END AS BIGINT)
         AS est_distinct,
       e.exact_distinct
FROM s JOIN e USING (source)
"""


@query(
    "x_kmv_distinct",
    _XKMV_SQL,
    doc=(
        "KMV / bottom-k distinct sketch (Bar-Yossef et al., RANDOM "
        "2002): per source keep the k=64 smallest distinct 60-bit md5 "
        "hash values; if the sketch is full the distinct estimate is "
        "(k-1) * H / h_k (unbiased for the k-th order statistic of "
        "uniform hashes), else the sketch IS the exact distinct set. "
        "A second mergeable distinct-estimator family beside "
        "x_hll_distinct: union = concatenate sketches and re-take the "
        "k smallest (64 longs per group forever), and unlike HLL the "
        "sketch supports direct intersection estimates (Jaccard of "
        "bottom-k sets). Exact per-source distinct rides along as the "
        "error scorecard. Determinism: integer hashes end-to-end, one "
        "trailing double divide inside floor() in identical op order "
        "on both engines. Scale: the distinct contraction is a partial "
        "agg (map-side combine), then only distinct (source, hash) "
        "pairs shuffle once; state per group is k longs."
    ),
)
def x_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("source", "text")
    h = d.select(
        "source",
        md5_long(F.concat(F.lit("kmv:"), F.col("text")), _KMV_HEX).alias("hv"),
    ).distinct()
    w = Window.partitionBy("source").orderBy("hv")
    r = h.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _KMV_K
    )
    s = r.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("in_sketch"),
        F.max("hv").cast("long").alias("kth_hash"),
    )
    e = d.groupBy("source").agg(
        F.countDistinct("text").cast("long").alias("exact_distinct")
    )
    est = F.when(F.col("in_sketch") < _KMV_K, F.col("in_sketch")).otherwise(
        F.floor(
            F.lit(float(_KMV_K - 1))
            * F.lit(_KMV_H)
            / F.col("kth_hash").cast("double")
        )
    )
    return s.join(e, "source").select(
        "source",
        F.lit(_KMV_K).cast("int").alias("k"),
        "in_sketch",
        "kth_hash",
        est.cast("bigint").alias("est_distinct"),
        "exact_distinct",
    )
