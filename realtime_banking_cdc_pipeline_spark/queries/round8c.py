"""Round-8 closing batch (reference analog: the reference's compute is
dbt/Snowflake marts, `models/`; these extend the multimodal + sketch +
layout + graph surface the survey calls for):

- x_image_resize — REAL image downsample: decode (shared real PPM/BMP/
  PNG/GIF parser) + 2x2 integer box filter, the resize step of the
  decode / feature-extract / RESIZE / frame-sample multimodal quartet.
- x_kmv_distinct / x_kmv_jaccard — KMV bottom-k sketch (Bar-Yossef et
  al. 2002) and its pairwise Jaccard/intersection estimator (Beyer et
  al., SIGMOD 2007): the mergeable distinct family beside HLL, with
  the direct set-intersection capability HLL register algebra lacks.
- x_zorder_pruning_eval — the measured file-skipping win of the
  Z-order layout (round8b) as data: 2-D range probes vs per-file
  extents AND ground truth, both layouts.
- x_bfs_layers — bounded-radius multi-source BFS (frontier-based
  operators/components.py:bfs_distances) over the heterogeneous
  customer-order-part-supplier entity graph: the blast-radius /
  investigation-expansion traversal, and the reachability primitive
  the graph tier lacked.
- x_ddsketch_quantiles — mergeable relative-error quantile sketch
  (DDSketch, Masson et al. VLDB 2019) on deterministic integer
  power-of-2 bins: completes the sketch taxonomy (distinct HLL/KMV,
  frequency CMS, membership Bloom, quantiles this).

Every estimator ships with its exact scorecard in the result rows.
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
  SELECT source, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS exact_distinct
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
    # digest-distinct, not raw-text-distinct: 16 bytes shuffle per row
    e = d.groupBy("source").agg(
        F.countDistinct(F.md5(F.col("text").cast("binary")))
        .cast("long")
        .alias("exact_distinct")
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


# ---------------------------------------------------------------------------
# x_kmv_jaccard — pairwise Jaccard / intersection from bottom-k sketches
# ---------------------------------------------------------------------------

_XKMVJ_SQL = f"""
WITH h AS (
  SELECT DISTINCT source,
         CAST('0x' || substr(md5('kmv:' || text), 1, {_KMV_HEX}) AS BIGINT)
           AS hv
  FROM documents
),
sk AS (
  SELECT source, hv FROM (
    SELECT source, hv,
           row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
    FROM h
  ) WHERE rk <= {_KMV_K}
),
srcs AS (SELECT DISTINCT source FROM documents),
pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM srcs a JOIN srcs b ON a.source < b.source
),
uni AS (
  SELECT p.sa, p.sb, s.hv,
         MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.source = p.sa OR s.source = p.sb
  GROUP BY 1, 2, 3
),
comb AS (
  SELECT sa, sb, hv, in_a, in_b,
         row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rk
  FROM uni
),
top AS (
  SELECT sa, sb,
         CAST(COUNT(*) AS BIGINT) AS combined_size,
         CAST(SUM(in_a * in_b) AS BIGINT) AS in_both,
         MAX(hv) AS hk
  FROM comb WHERE rk <= {_KMV_K} GROUP BY sa, sb
),
est AS (
  SELECT sa, sb, combined_size, in_both,
         CASE WHEN combined_size < {_KMV_K} THEN CAST(combined_size AS DOUBLE)
              ELSE floor({_KMV_K - 1}.0 * {_KMV_H!r} / CAST(hk AS DOUBLE)) END
           AS est_union_d
  FROM top
),
st AS (SELECT DISTINCT source, md5(text) AS d FROM documents),
ecnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c FROM st GROUP BY source),
einter AS (
  SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS n
  FROM st a JOIN st b ON a.d = b.d AND a.source < b.source
  GROUP BY 1, 2
)
SELECT e.sa, e.sb,
       CAST({_KMV_K} AS INTEGER) AS k,
       e.combined_size,
       e.in_both,
       CAST(e.est_union_d AS BIGINT) AS est_union,
       CAST(floor(CAST(e.in_both AS DOUBLE) * e.est_union_d
                  / e.combined_size) AS BIGINT) AS est_intersection,
       1000000 * e.in_both // e.combined_size AS est_jaccard_ppm,
       CAST(COALESCE(i.n, 0) AS BIGINT) AS exact_intersection,
       ca.c + cb.c - CAST(COALESCE(i.n, 0) AS BIGINT) AS exact_union,
       1000000 * CAST(COALESCE(i.n, 0) AS BIGINT)
         // (ca.c + cb.c - CAST(COALESCE(i.n, 0) AS BIGINT))
         AS exact_jaccard_ppm
FROM est e
LEFT JOIN einter i ON i.sa = e.sa AND i.sb = e.sb
JOIN ecnt ca ON ca.source = e.sa
JOIN ecnt cb ON cb.source = e.sb
"""


@query(
    "x_kmv_jaccard",
    _XKMVJ_SQL,
    doc=(
        "Pairwise set similarity from KMV bottom-k sketches (Beyer et "
        "al., SIGMOD 2007 'On synopses for distinct-value estimation "
        "under multiset operations'): the combined sketch of A union B "
        "is the k smallest of the two sketches' union, Jaccard is "
        "estimated by the fraction of combined members present in BOTH "
        "sketches, and the intersection estimate is that fraction "
        "times the union's KMV estimate — set INTERSECTION from "
        "64-long sketches, the operation HLL register algebra cannot "
        "express directly (x_hll_overlap needs inclusion-exclusion of "
        "three estimates; this reads the sketches alone). Exact "
        "pairwise Jaccard rides along as the error scorecard. Scale: "
        "pair stage touches only sketch rows (<= k per source), never "
        "the corpus; P pairs cost P*2k rows. Determinism: integer "
        "hashes and integer ppm ratios; the two union/intersection "
        "estimates use floor() around an identical double op chain."
    ),
)
def x_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("source", "text")
    h = d.select(
        "source",
        md5_long(F.concat(F.lit("kmv:"), F.col("text")), _KMV_HEX).alias("hv"),
    ).distinct()
    w = Window.partitionBy("source").orderBy("hv")
    sk = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .drop("rk")
    )
    srcs = d.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("sa")).join(
        srcs.select(F.col("source").alias("sb")), F.col("sa") < F.col("sb")
    )
    # tag sketch rows by side via two equi-joins (no OR-join), then
    # merge membership flags per (pair, hash)
    left = pairs.join(sk, F.col("source") == F.col("sa")).select(
        "sa", "sb", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    right = pairs.join(sk, F.col("source") == F.col("sb")).select(
        "sa", "sb", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    uni = (
        left.unionByName(right)
        .groupBy("sa", "sb", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("sa", "sb").orderBy("hv")
    top = (
        uni.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= _KMV_K)
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("combined_size"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("in_both"),
            F.max("hv").alias("hk"),
        )
    )
    est_union_d = F.when(
        F.col("combined_size") < _KMV_K, F.col("combined_size").cast("double")
    ).otherwise(
        F.floor(
            F.lit(float(_KMV_K - 1))
            * F.lit(_KMV_H)
            / F.col("hk").cast("double")
        ).cast("double")
    )
    est = top.withColumn("est_union_d", est_union_d)

    # md5 digests shuffle, never raw text (house rule; oracle joins the
    # same digests)
    st = d.select(
        "source", F.md5(F.col("text").cast("binary")).alias("d")
    ).distinct()
    ecnt = st.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("c"))
    einter = (
        st.select(F.col("source").alias("sa"), "d")
        .join(st.select(F.col("source").alias("sb"), "d"), ["d"])
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ca = ecnt.select(F.col("source").alias("sa"), F.col("c").alias("ca"))
    cb = ecnt.select(F.col("source").alias("sb"), F.col("c").alias("cb"))
    exact_i = F.coalesce(F.col("n"), F.lit(0)).cast("long")
    exact_u = F.col("ca") + F.col("cb") - exact_i
    return (
        est.join(einter, ["sa", "sb"], "left")
        .join(ca, "sa")
        .join(cb, "sb")
        .select(
            "sa",
            "sb",
            F.lit(_KMV_K).cast("int").alias("k"),
            "combined_size",
            "in_both",
            F.col("est_union_d").cast("bigint").alias("est_union"),
            F.floor(
                F.col("in_both").cast("double")
                * F.col("est_union_d")
                / F.col("combined_size")
            )
            .cast("bigint")
            .alias("est_intersection"),
            F.expr("1000000 * in_both div combined_size")
            .cast("long")
            .alias("est_jaccard_ppm"),
            exact_i.alias("exact_intersection"),
            exact_u.cast("long").alias("exact_union"),
            (F.lit(1000000) * exact_i).cast("long").alias("_num"),
        )
        .withColumn(
            "exact_jaccard_ppm",
            F.expr("_num div exact_union").cast("long"),
        )
        .drop("_num")
    )


# ---------------------------------------------------------------------------
# x_zorder_pruning_eval — measured file-skipping win of the Z-order layout
# ---------------------------------------------------------------------------

from .round8b import _Z_BITS, _Z_FILES, _bit_interleave_sql  # noqa: E402

_ZP_PROBES = ((0, 0), (16, 24), (32, 40), (48, 8))  # 8x8 range predicates
_ZP_SPAN = 7


def _zp_probes_sql() -> str:
    rows = ", ".join(f"({px}, {py})" for px, py in _ZP_PROBES)
    return f"(VALUES {rows}) AS p(px, py)"


_XZPRUNE_SQL = f"""
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
),
extents AS (
  SELECT layout, file_id, COUNT(*) AS rows_in_file,
         MIN(cx) AS min_cx, MAX(cx) AS max_cx,
         MIN(cy) AS min_cy, MAX(cy) AS max_cy
  FROM assigned GROUP BY layout, file_id
),
touched AS (
  SELECT e.layout, p.px, p.py,
         COUNT(*) AS files_touched,
         SUM(e.rows_in_file) AS rows_scanned
  FROM extents e JOIN {_zp_probes_sql()}
    ON e.min_cx <= p.px + {_ZP_SPAN} AND e.max_cx >= p.px
   AND e.min_cy <= p.py + {_ZP_SPAN} AND e.max_cy >= p.py
  GROUP BY 1, 2, 3
),
matched AS (
  SELECT a.layout, p.px, p.py, COUNT(*) AS rows_matched
  FROM assigned a JOIN {_zp_probes_sql()}
    ON a.cx BETWEEN p.px AND p.px + {_ZP_SPAN}
   AND a.cy BETWEEN p.py AND p.py + {_ZP_SPAN}
  GROUP BY 1, 2, 3
)
SELECT t.layout,
       CAST(t.px AS INTEGER) AS px, CAST(t.py AS INTEGER) AS py,
       CAST(t.files_touched AS BIGINT) AS files_touched,
       CAST(t.rows_scanned AS BIGINT) AS rows_scanned,
       CAST(COALESCE(m.rows_matched, 0) AS BIGINT) AS rows_matched
FROM touched t
LEFT JOIN matched m
  ON m.layout = t.layout AND m.px = t.px AND m.py = t.py
"""


@query(
    "x_zorder_pruning_eval",
    _XZPRUNE_SQL,
    doc=(
        "The measured file-skipping win of x_zorder_layout: four 8x8 "
        "two-dimensional range predicates are evaluated against the "
        "per-file min/max extents table (files_touched = extents whose "
        "bounding box intersects the predicate — exactly the parquet "
        "footer-stats pruning a scan does) and against the rows "
        "themselves (rows_matched = ground truth), for BOTH layouts. "
        "The result rows show the pruning ratio directly: Z-order "
        "files bound both dims so rows_scanned hugs rows_matched, "
        "while linear files span the full second dimension and scan "
        "~the whole probe stripe. Scale: the extents table is 128 "
        "rows regardless of data size — the probe join is a broadcast "
        "against a singleton; only the ground-truth count touches the "
        "fact rows, one filter+agg pass."
    ),
)
def x_zorder_pruning_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .round8b import x_zorder_layout

    extents = x_zorder_layout(spark, sf_dir)

    probes = spark.createDataFrame(
        list(_ZP_PROBES), "px int, py int"
    )

    touched = (
        extents.join(
            F.broadcast(probes),
            (F.col("min_cx") <= F.col("px") + _ZP_SPAN)
            & (F.col("max_cx") >= F.col("px"))
            & (F.col("min_cy") <= F.col("py") + _ZP_SPAN)
            & (F.col("max_cy") >= F.col("py")),
        )
        .groupBy("layout", "px", "py")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_touched"),
            F.sum("rows_in_file").cast("long").alias("rows_scanned"),
        )
    )

    from ..sources.parquet_io import read_table

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
    both = base.select(F.lit("zorder").alias("layout"), "cx", "cy").unionByName(
        base.select(F.lit("linear").alias("layout"), "cx", "cy")
    )
    matched = (
        both.join(
            F.broadcast(probes),
            F.col("cx").between(F.col("px"), F.col("px") + _ZP_SPAN)
            & F.col("cy").between(F.col("py"), F.col("py") + _ZP_SPAN),
        )
        .groupBy("layout", "px", "py")
        .agg(F.count(F.lit(1)).cast("long").alias("rows_matched"))
    )
    return (
        touched.join(matched, ["layout", "px", "py"], "left")
        .select(
            "layout",
            F.col("px").cast("int"),
            F.col("py").cast("int"),
            "files_touched",
            "rows_scanned",
            F.coalesce("rows_matched", F.lit(0))
            .cast("long")
            .alias("rows_matched"),
        )
    )


# ---------------------------------------------------------------------------
# x_bfs_layers — bounded-radius entity blast-radius BFS (multi-source)
# ---------------------------------------------------------------------------

_BFS_ITERS = 4
_BFS_SEED_MOD = 200
_BFS_T = 1_000_000_000  # typed-id stride: 1=customer 2=order 3=part 4=supplier


def _dd_bfs_sql() -> str:
    """Oracle twin of operators/components.py:bfs_distances over the
    heterogeneous entity graph, BFS rounds unrolled (min-union per
    round — identical semantics to the Spark loop)."""
    rounds = []
    for i in range(_BFS_ITERS):
        rounds.append(f"""
r{i + 1} AS (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM r{i}
    UNION ALL
    SELECT e.dst AS id, r{i}.dist + 1 AS dist
    FROM edges e JOIN r{i} ON r{i}.id = e.src
  ) GROUP BY id
)""")
    return f"""
WITH e0 AS (
  SELECT {_BFS_T} + o_custkey AS src, {2 * _BFS_T} + o_orderkey AS dst
  FROM orders
  UNION
  SELECT {2 * _BFS_T} + l_orderkey, {3 * _BFS_T} + l_partkey FROM lineitem
  UNION
  SELECT {3 * _BFS_T} + l_partkey, {4 * _BFS_T} + l_suppkey FROM lineitem
),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
nodes AS (SELECT DISTINCT src AS id FROM edges),
r0 AS (
  SELECT id, 0 AS dist FROM nodes
  WHERE id % {_BFS_SEED_MOD} = 0 AND id < {2 * _BFS_T}
),
{",".join(rounds)}
SELECT id AS node_id,
       CASE id // {_BFS_T} WHEN 1 THEN 'customer' WHEN 2 THEN 'order'
            WHEN 3 THEN 'part' ELSE 'supplier' END AS node_type,
       CAST(dist AS BIGINT) AS dist
FROM r{_BFS_ITERS}
"""


@query(
    "x_bfs_layers",
    _dd_bfs_sql(),
    doc=(
        f"Bounded-radius multi-source BFS ({_BFS_ITERS} rounds) over "
        "the heterogeneous entity graph customer—order—part—supplier "
        "(typed node ids in disjoint 1e9 strides; edges from orders + "
        "lineitem) — the blast-radius / fraud-ring-expansion traversal "
        "a lineage or investigation pipeline runs from flagged seed "
        "entities (here: every 200th customer), and the reachability "
        "primitive the graph tier lacked beside components/PageRank/"
        "triangles/k-core (operators/components.py:bfs_distances). Per "
        "round: one co-partitioned frontier-x-edges join + one min-agg "
        "on the node key; no driver state at all; nodes beyond the "
        "radius are absent by contract so cost and lineage stay "
        "constant (each round's frontier is persisted — the min-union "
        "references it twice and unbounded lineage would recompute "
        "2^iters times). Distances are small exact integers — "
        "hash-identical across engines with no fixed-point machinery; "
        "the oracle unrolls the identical min-union rounds over the "
        "identical edge set. Scale: frontier <= nodes, every round is "
        "the connected-components join shape on a hash-partitioned "
        "node key; bounded radius is how 100 TB neighborhoods stay "
        "computable."
    ),
)
def x_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import bfs_distances
    from ..sources.parquet_io import read_table

    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    e0 = (
        o.select(
            (F.lit(_BFS_T) + F.col("o_custkey")).alias("src"),
            (F.lit(2 * _BFS_T) + F.col("o_orderkey")).alias("dst"),
        )
        .unionByName(
            li.select(
                (F.lit(2 * _BFS_T) + F.col("l_orderkey")).alias("src"),
                (F.lit(3 * _BFS_T) + F.col("l_partkey")).alias("dst"),
            )
        )
        .unionByName(
            li.select(
                (F.lit(3 * _BFS_T) + F.col("l_partkey")).alias("src"),
                (F.lit(4 * _BFS_T) + F.col("l_suppkey")).alias("dst"),
            )
        )
        # no pre-distinct: bfs_distances dedupes the symmetrized edge
        # set once — a second full-corpus distinct here doubled the
        # shuffle volume for nothing (plan audit)
    )
    # customer nodes are exactly the customers with >= 1 order, so the
    # seed set derives from the orders dim without materializing the
    # full node set (another full-corpus distinct saved)
    seeds = (
        o.select((F.lit(_BFS_T) + F.col("o_custkey")).alias("id"))
        .distinct()
        .filter(F.col("id") % _BFS_SEED_MOD == 0)
    )
    d = bfs_distances(e0, seeds, src="src", dst="dst", iters=_BFS_ITERS)
    node_type = (
        F.when(F.expr(f"id div {_BFS_T}") == 1, "customer")
        .when(F.expr(f"id div {_BFS_T}") == 2, "order")
        .when(F.expr(f"id div {_BFS_T}") == 3, "part")
        .otherwise("supplier")
    )
    return d.select(
        F.col("id").alias("node_id"), node_type.alias("node_type"), "dist"
    )


# ---------------------------------------------------------------------------
# x_ddsketch_quantiles — mergeable relative-error quantile sketch
# ---------------------------------------------------------------------------

_DDS_QS = (1, 25, 50, 75, 90, 99)

# Integer bin index: values < 32 get exact unit bins; otherwise
# 16 sub-buckets per power of two (4 mantissa bits) -> relative bin
# width 1/16. e = bit_length(v) via length(bin(v)) (the house no-libm
# log2); shifts stay well under 63 bits for any DECIMAL(18,2) cents.
_DDS_IDX = (
    "CASE WHEN e <= 5 THEN cents ELSE 16 * e"
    " + (cents - (val1 << (e - 1))) {intdiv} (val1 << (e - 5)) END"
)
_DDS_LB = (
    "CASE WHEN idx <= 31 THEN idx ELSE (val1 << (idx {intdiv} 16 - 1))"
    " + (idx % 16) * (val1 << (idx {intdiv} 16 - 5)) END"
)

_XDDS_SQL = f"""
WITH base AS (
  SELECT o_orderpriority AS prio,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         1::BIGINT AS val1
  FROM orders
),
binned AS (
  SELECT prio, cents,
         {_DDS_IDX.format(intdiv="//")} AS idx
  FROM (SELECT prio, cents, val1, length(bin(cents)) AS e FROM base)
),
hist AS (
  SELECT prio, idx, COUNT(*) AS cnt FROM binned GROUP BY prio, idx
),
cum AS (
  SELECT prio, idx,
         SUM(cnt) OVER (PARTITION BY prio ORDER BY idx
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
n AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY prio),
qs AS (SELECT unnest(ARRAY{list(_DDS_QS)}) AS q_pct),
targets AS (
  SELECT n.prio, n.n, qs.q_pct,
         (qs.q_pct * n.n + 99) // 100 AS k FROM n, qs
),
est AS (
  SELECT t.prio, t.q_pct, t.n, MIN(c.idx) AS idx
  FROM targets t JOIN cum c ON c.prio = t.prio AND c.cum >= t.k
  GROUP BY t.prio, t.q_pct, t.n
),
ranked AS (
  SELECT prio, cents,
         row_number() OVER (PARTITION BY prio ORDER BY cents) AS rn
  FROM binned
),
exact AS (
  SELECT t.prio, t.q_pct, r.cents AS exact_cents
  FROM targets t JOIN ranked r ON r.prio = t.prio AND r.rn = t.k
)
SELECT e.prio, CAST(e.q_pct AS INTEGER) AS q_pct, e.n,
       CAST({_DDS_LB.format(intdiv="//")} AS BIGINT) AS est_cents,
       x.exact_cents,
       1000000 * (x.exact_cents
                  - CAST({_DDS_LB.format(intdiv="//")} AS BIGINT))
         // x.exact_cents AS err_ppm
FROM (SELECT prio, q_pct, n, idx, 1::BIGINT AS val1 FROM est) e
JOIN exact x ON x.prio = e.prio AND x.q_pct = e.q_pct
"""


@query(
    "x_ddsketch_quantiles",
    _XDDS_SQL,
    doc=(
        "Mergeable relative-error quantile sketch (DDSketch, Masson et "
        "al. VLDB 2019, adapted to deterministic integer bins): money "
        "routes through the house DECIMAL(18,2)->cents rule, bin index "
        "= 16*bit_length + 4 mantissa bits (unit bins below 32) so the "
        "bin width is 1/16 of the value — guaranteed <= 6.25% relative "
        "error at ANY quantile, and the histogram is pure additive "
        "state (a few hundred longs per group: merge = add counts, the "
        "property exact sort-based percentiles lack at 100 TB). "
        "Quantile estimate = lower bound of the first bin whose "
        "cumulative count reaches ceil(q*N/100); the exact order "
        "statistic rides along as the error scorecard (err_ppm, "
        "bounded by construction). Completes the sketch taxonomy: "
        "distinct (HLL/KMV), frequency (CMS), membership (Bloom), "
        "quantiles (this). All arithmetic integer (bit_length via "
        "length(bin(x)), checked shifts <= 40); one corpus scan for "
        "the histogram, one for the scorecard's exact ranks."
    ),
)
def x_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.parquet_io import read_table
    from ._det import dec

    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("prio"),
        (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.expr("cast(1 as bigint)").alias("val1"),
    )
    binned = base.withColumn("e", F.length(F.bin("cents"))).selectExpr(
        "prio", "cents", _DDS_IDX.format(intdiv="div") + " AS idx"
    )
    hist = binned.groupBy("prio", "idx").agg(F.count(F.lit(1)).alias("cnt"))
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("prio").orderBy("idx").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    n = base.groupBy("prio").agg(F.count(F.lit(1)).cast("long").alias("n"))
    qs = spark.createDataFrame([(q,) for q in _DDS_QS], "q_pct int")
    targets = n.join(F.broadcast(qs)).withColumn(
        "k", F.expr("(q_pct * n + 99) div 100")
    )
    est = (
        targets.join(
            cum.withColumnRenamed("prio", "cprio"),
            (F.col("cprio") == F.col("prio")) & (F.col("cum") >= F.col("k")),
        )
        .groupBy("prio", "q_pct", "n")
        .agg(F.min("idx").alias("idx"))
    )
    ranked = binned.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("prio").orderBy("cents")),
    )
    exact = targets.join(
        ranked.withColumnRenamed("prio", "rprio"),
        (F.col("rprio") == F.col("prio")) & (F.col("rn") == F.col("k")),
    ).select("prio", "q_pct", F.col("cents").alias("exact_cents"))
    lb = _DDS_LB.format(intdiv="div")
    return (
        est.withColumn("val1", F.expr("cast(1 as bigint)"))
        .join(exact, ["prio", "q_pct"])
        .selectExpr(
            "prio",
            "cast(q_pct as int) as q_pct",
            "n",
            f"cast({lb} as bigint) as est_cents",
            "exact_cents",
            f"1000000 * (exact_cents - cast({lb} as bigint))"
            " div exact_cents as err_ppm",
        )
    )
