"""Round-8 additions (reference analog: the reference's compute is
dbt/Snowflake marts, `models/`; these extend the training-data-pipeline
surface the survey calls for):

- x_image_png_stats — REAL PNG decode with only the standard library:
  PNG's sole compression is deflate (stdlib zlib) and its five row
  filters are exact integer arithmetic, so the whole codec fits
  in-container. Extends the image battery beyond PPM/BMP.
- x_image_gif_stats — REAL GIF87a decode: a from-scratch
  variable-width LZW decoder (stdlib only) — a second, genuinely
  different compression algorithm under the strict hash gate.

Determinism follows queries/_det.py house rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .llmdata import _docs
from .registry import query

# ---------------------------------------------------------------------------
# x_image_png_stats — stdlib-zlib PNG decode over mapInPandas
# ---------------------------------------------------------------------------

# Dims guarantee height >= 5 so every image exercises ALL five PNG row
# filters (synthesize_png cycles filter type r % 5 by row).
_PNG_W = "8 + doc_id % 11"
_PNG_H = "5 + doc_id % 9"

_XPNG_SQL = f"""
WITH m AS (
  SELECT doc_id, {_PNG_W} AS w, {_PNG_H} AS h FROM documents
),
px AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS k FROM m
),
s AS (
  SELECT doc_id, w, h,
         SUM((doc_id + 3 * k + 0) % 256) AS sum_r,
         SUM((doc_id + 3 * k + 1) % 256) AS sum_g,
         SUM((doc_id + 3 * k + 2) % 256) AS sum_b
  FROM px GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(sum_r AS BIGINT) AS sum_r,
       CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b
FROM s
"""


@query(
    "x_image_png_stats",
    _XPNG_SQL,
    doc=(
        "REAL PNG decode with NO codec library: deterministic 8-bit "
        "RGB PNGs (zlib-deflated IDAT, correct CRCs, row filters "
        "cycling through all five PNG filter types) are synthesized "
        "per doc, then fully decoded inside mapInPandas — chunk walk, "
        "stdlib-zlib inflate, exact integer unfilter (Sub/Up/Average/"
        "Paeth), per-channel pixel sums. The oracle recomputes the "
        "sums analytically from the generative formula, so a single "
        "wrong byte in any unfilter path breaks the hash gate — the "
        "decode is verified, not stubbed (functions/multimodal.py: "
        "synthesize_png/_png_unfilter). Payloads are built and "
        "consumed executor-side in Arrow batches and never shuffle; "
        "the output is 7 small columns per image — the 100 TB media "
        "posture (move features, not bytes)."
    ),
)
def x_image_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from ..functions.multimodal import extract_image_features, synthesize_png

    def _make_png(mid, w, h):
        return pd.Series(
            [synthesize_png(int(m), int(a), int(b)) for m, a, b in zip(mid, w, h)]
        )

    make_png = pandas_udf(_make_png, "binary", PandasUDFType.SCALAR)

    d = _docs(spark, sf_dir).select(F.col("doc_id").alias("media_id"))
    media = d.select(
        "media_id",
        make_png(
            F.col("media_id"),
            F.expr(_PNG_W.replace("doc_id", "media_id")).cast("int"),
            F.expr(_PNG_H.replace("doc_id", "media_id")).cast("int"),
        ).alias("payload"),
    )
    return extract_image_features(media)


# ---------------------------------------------------------------------------
# x_semdedup_recall_eval — quantizer scorecard for the two-level cells
# ---------------------------------------------------------------------------

# Target anchor count: a deterministic residue-class sample (vec_id %
# step == 0 with step = max(1, N // 256)) — NOT a prefix, because the
# first k vec_ids ARE the fine centroids and a prefix sample would
# grade the quantizer on its own codebook.
_RECALL_ANCHORS = 256


def _dd_semdedup_recall_sql() -> str:
    from .llmdata import _FXQ
    from .round6b import _SEMDEDUP_THRESHOLD, _dd_two_level_cells_cte

    fx = _FXQ.format
    return f"""
WITH {_dd_two_level_cells_cte()},
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
st AS (SELECT GREATEST(1, n // {_RECALL_ANCHORS}) AS step FROM nv),
anchors AS (SELECT vec_id AS i FROM e, st WHERE vec_id % st.step = 0),
ap AS (SELECT a.i, b.vec_id AS j,
              unnest(ea.embedding) AS x, unnest(b.embedding) AS y
       FROM anchors a JOIN e ea ON ea.vec_id = a.i, e b
       WHERE b.vec_id <> a.i),
apd AS (SELECT i, j, SUM({fx(v='x')} * {fx(v='y')}) AS dot
        FROM ap GROUP BY 1, 2),
truth AS (
  SELECT d.i, d.j
  FROM apd d JOIN norms ni ON ni.vec_id = d.i
             JOIN norms nj ON nj.vec_id = d.j
  WHERE CAST(d.dot AS DOUBLE)
        / sqrt(CAST(ni.nn AS DOUBLE) * CAST(nj.nn AS DOUBLE))
        >= {_SEMDEDUP_THRESHOLD}
),
flagged AS (
  SELECT t.i, t.j, (ci.cid = cj.cid) AS same_cell
  FROM truth t JOIN cells ci ON ci.vec_id = t.i
               JOIN cells cj ON cj.vec_id = t.j
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_pairs,
         CAST(COALESCE(SUM(CASE WHEN same_cell THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS captured_pairs
  FROM flagged
),
cq AS (
  SELECT CAST(SUM(sz * sz) AS BIGINT) AS cell_sum_sq,
         CAST(MAX(sz) AS BIGINT) AS max_cell
  FROM (SELECT cid, COUNT(*) AS sz FROM cells GROUP BY 1)
)
SELECT (SELECT n FROM nv) AS n_vectors,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM anchors) AS n_anchors,
       agg.true_pairs, agg.captured_pairs,
       CASE WHEN agg.true_pairs = 0 THEN CAST(0 AS BIGINT)
            ELSE agg.captured_pairs * 1000000 // agg.true_pairs
       END AS recall_ppm,
       cq.cell_sum_sq, cq.max_cell
FROM agg, cq
"""


@query(
    "x_semdedup_recall_eval",
    _dd_semdedup_recall_sql(),
    doc=(
        "Quantizer scorecard for the round-8 two-level multi-probe "
        "SemDeDup cells: ground-truth near-duplicate pairs are computed "
        "EXHAUSTIVELY for a deterministic ~256-anchor residue-class "
        "sample (anchor x all-N cosines - linear in N for a fixed "
        "anchor budget, the same eval shape as x_ann_recall_eval), "
        "then scored against the shipped cell assignment: a true pair "
        "is captured iff both ends land in the same fine cell, i.e. "
        "iff the registered x_semdedup would actually compare it. One "
        "row: recall_ppm (exact integer fixed-point ratio) plus the "
        "pair-stage quality bounds (sum of squared cell sizes = the "
        "candidate-pair budget, max cell = the straggler bound) that "
        "SCALE.md's nprobe A/B recorded at sf10. Anchors broadcast "
        "(<=~512 rows at any sf); the truth scan is one pass over the "
        "embeddings with per-row norms computed once; the cell joins "
        "ship ids only. Closes the loop on the multi-probe change: "
        "assignment got 9.9x cheaper - this query PROVES what it cost "
        "in comparison recall, per corpus, inside the hash gate."
    ),
)
def x_semdedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import fx_dot
    from .llmdata import _emb
    from .round6b import _SEMDEDUP_THRESHOLD, _two_level_cells

    emb, cells = _two_level_cells(spark, _emb(spark, sf_dir))
    n = emb.count()
    step = max(1, n // _RECALL_ANCHORS)
    emb2 = emb.select(
        "vec_id", "embedding", fx_dot(F.col("embedding"), F.col("embedding")).alias("nn")
    )
    anchors = emb2.filter(F.col("vec_id") % step == 0).select(
        F.col("vec_id").alias("i"),
        F.col("embedding").alias("av"),
        F.col("nn").alias("ni"),
    )
    pairs = emb2.join(F.broadcast(anchors), F.col("vec_id") != F.col("i"))
    truth = pairs.select(
        "i",
        F.col("vec_id").alias("j"),
        (
            fx_dot(F.col("av"), F.col("embedding")).cast("double")
            / F.sqrt(F.col("ni").cast("double") * F.col("nn").cast("double"))
        ).alias("cos"),
    ).filter(F.col("cos") >= _SEMDEDUP_THRESHOLD)
    flagged = (
        truth.join(
            cells.select(F.col("vec_id").alias("i"), F.col("cid").alias("ci")), "i"
        )
        .join(cells.select(F.col("vec_id").alias("j"), F.col("cid").alias("cj")), "j")
        .select((F.col("ci") == F.col("cj")).alias("same_cell"))
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("true_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("same_cell"), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("captured_pairs"),
    )
    cq = (
        cells.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.sum(F.col("sz") * F.col("sz")).cast("long").alias("cell_sum_sq"),
            F.max("sz").cast("long").alias("max_cell"),
        )
    )
    acount = anchors.agg(F.count(F.lit(1)).cast("long").alias("n_anchors"))
    return (
        agg.crossJoin(F.broadcast(acount))
        .crossJoin(F.broadcast(cq))
        .select(
            F.lit(n).cast("long").alias("n_vectors"),
            "n_anchors",
            "true_pairs",
            "captured_pairs",
            F.expr(
                "CASE WHEN true_pairs = 0 THEN CAST(0 AS BIGINT) "
                "ELSE captured_pairs * CAST(1000000 AS BIGINT) div true_pairs END"
            ).alias("recall_ppm"),
            "cell_sum_sq",
            "max_cell",
        )
    )


# ---------------------------------------------------------------------------
# x_semdedup_capped — linear-bound pair stage (cell-size cap)
# ---------------------------------------------------------------------------

# Per-cell comparison budget. Members rank by (ccos DESC, vec_id ASC) —
# closest-to-centroid first, the paper's representative order — and
# every member compares only against the top-_SEM_CAP ranked cell-mates
# with a lower vec_id: candidate pairs <= N * _SEM_CAP, LINEAR in the
# corpus, vs the uncapped within-cell N^2/k ~ N^1.5.
_SEM_CAP = 64


def _dd_semdedup_capped_sql() -> str:
    from .llmdata import _FXQ
    from .round6b import _SEMDEDUP_THRESHOLD, _dd_two_level_cells_cte

    fx = _FXQ.format
    return f"""
WITH {_dd_two_level_cells_cte()},
m AS (SELECT cells.vec_id, cells.cid, cells.ccos, e.embedding
      FROM cells JOIN e USING (vec_id)),
r AS (SELECT vec_id, cid, embedding,
             ROW_NUMBER() OVER (
               PARTITION BY cid ORDER BY ccos DESC, vec_id ASC) AS rn
      FROM m),
capset AS (SELECT cid, vec_id, embedding FROM r WHERE rn <= {_SEM_CAP}),
mp AS (SELECT x.cid, x.vec_id AS i, y.vec_id AS j,
              unnest(x.embedding) AS a, unnest(y.embedding) AS b
       FROM capset x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id),
pdots AS (SELECT cid, i, j, SUM({fx(v='a')} * {fx(v='b')}) AS dot
          FROM mp GROUP BY 1, 2, 3),
dropped AS (
  SELECT DISTINCT p.j AS vec_id
  FROM pdots p JOIN norms na ON na.vec_id = p.i
               JOIN norms nb ON nb.vec_id = p.j
  WHERE CAST(p.dot AS DOUBLE)
        / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE))
        >= {_SEMDEDUP_THRESHOLD}
)
SELECT m.vec_id, m.cid AS cell,
       (dropped.vec_id IS NULL) AS keep
FROM m LEFT JOIN dropped ON dropped.vec_id = m.vec_id
"""


@query(
    "x_semdedup_capped",
    _dd_semdedup_capped_sql(),
    bench=True,
    doc=(
        "SemDeDup with a LINEAR pair stage: members rank within their "
        "cell by (cosine-to-centroid DESC, vec_id ASC) and every member "
        "compares only against the top-64 ranked cell-mates with a "
        "lower vec_id — candidate pairs <= 64*N regardless of cell "
        "skew, vs the uncapped within-cell N^2/k ~ O(N^1.5) that "
        "SCALE.md names as the family's last super-linear term. This "
        "is the paper-sanctioned approximation (arXiv:2303.09540 "
        "compares against cluster representatives, not all pairs): "
        "duplicates of a crowded cell's deep tail can survive, and "
        "when NO cell exceeds the cap the result is IDENTICAL to "
        "x_semdedup (pinned by test: at sf0.01 max cell 42 < 64, "
        "same keeps). Same plan skeleton as x_semdedup — one persist "
        "of (vec_id, cid, ccos, embedding, nn), one cid-keyed rank "
        "window, the capped self-join ships the 64-row capset side "
        "map-side under AQE — so the 100 TB posture is the uncapped "
        "query's with the quadratic term deleted."
    ),
)
def x_semdedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..caching import track_persist
    from ..functions.similarity import fx_dot
    from .llmdata import _emb
    from .round6b import _SEMDEDUP_THRESHOLD, _two_level_cells

    emb, cells = _two_level_cells(spark, _emb(spark, sf_dir))
    # lazy persist — an eager checkpoint of these embedding-array rows
    # measured 1.6x slower at sf0.1 (see x_semdedup)
    m = track_persist(
        cells.select("vec_id", "cid", "ccos")
        .join(emb, "vec_id")
        .select("vec_id", "cid", "ccos", "embedding")
        .withColumn("nn", fx_dot(F.col("embedding"), F.col("embedding")))
    )
    w = Window.partitionBy("cid").orderBy(
        F.col("ccos").desc(), F.col("vec_id").asc()
    )
    capset = (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SEM_CAP)
        .select(
            F.col("cid").alias("ca"),
            F.col("vec_id").alias("i"),
            F.col("embedding").alias("ea"),
            F.col("nn").alias("na"),
        )
    )
    b = m.select(
        F.col("cid").alias("cb"),
        F.col("vec_id").alias("j"),
        F.col("embedding").alias("eb"),
        F.col("nn").alias("nb"),
    )
    pair_cos = fx_dot(F.col("eb"), F.col("ea")).cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    dropped = (
        capset.join(b, (F.col("ca") == F.col("cb")) & (F.col("i") < F.col("j")))
        .filter(pair_cos >= _SEMDEDUP_THRESHOLD)
        .select(F.col("j").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return m.join(dropped, "vec_id", "left_outer").select(
        "vec_id",
        F.col("cid").alias("cell"),
        F.col("__dropped").isNull().alias("keep"),
    )


# ---------------------------------------------------------------------------
# x_semdedup_refined — SemDeDup over a 1-round-Lloyd-refined quantizer
# ---------------------------------------------------------------------------

def _dd_refined_chain_cte() -> str:
    """Oracle CTE chain for the Lloyd round UNROLLED on top of the
    shared two-level assignment CTE: ``cells`` (the x_semdedup
    assignment) is generation 0, floor-mean refined centroids c1 are
    cut from it, and the SECOND assignment runs the same two-level
    (coarse-probe → fine) chain against c1 — so BOTH assignment passes
    are two-level and the whole training round sits under the strict
    hash gate. Ends at ``a1 (vec_id, cid, cos)`` — the refined cell
    per vector with its cosine (the cosine rides along for round9's
    capped variant; the uncapped pair stage ignores it). Callers
    prepend ``_dd_two_level_cells_cte()``."""
    from .llmdata import _FXLIST
    from .round6b import _COARSE_CELLS_SQL, _SEM_NPROBE

    kc1_expr = _COARSE_CELLS_SQL.replace(
        "CAST(k AS BIGINT)", "CAST(COUNT(*) AS BIGINT)"
    )
    return f"""fxl AS (SELECT vec_id, {_FXLIST} AS v FROM embeddings),
comp1 AS (
  SELECT cells.cid, t.i, SUM(t.x) AS s, COUNT(*) AS cnt
  FROM (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i
        FROM fxl) t
  JOIN cells USING (vec_id)
  GROUP BY cells.cid, t.i
),
c1 AS (SELECT cid,
              list(CAST(FLOOR(CAST(s AS DOUBLE) / cnt) AS BIGINT)
                   ORDER BY i) AS cv
       FROM comp1 GROUP BY cid),
cn1 AS (SELECT cid, SUM(x * x) AS nn
        FROM (SELECT cid, unnest(cv) AS x FROM c1) GROUP BY cid),
kc1 AS (SELECT {kc1_expr} AS kc FROM c1),
cc1 AS (SELECT cid AS ccid, cv AS ccv FROM (
          SELECT cid, cv, ROW_NUMBER() OVER (ORDER BY cid ASC) AS rn
          FROM c1), kc1
        WHERE rn <= kc1.kc),
ccn1 AS (SELECT ccid, SUM(x * x) AS nn
         FROM (SELECT ccid, unnest(ccv) AS x FROM cc1) GROUP BY ccid),
fcp1 AS (SELECT c1.cid, cc1.ccid, unnest(c1.cv) AS a, unnest(cc1.ccv) AS b
         FROM c1, cc1),
fcd1 AS (SELECT cid, ccid, SUM(a * b) AS dot FROM fcp1 GROUP BY 1, 2),
fcs1 AS (
  SELECT d.cid, d.ccid,
         CAST(d.dot AS DOUBLE)
           / sqrt(CAST(n.nn AS DOUBLE) * CAST(cn.nn AS DOUBLE)) AS cos
  FROM fcd1 d JOIN cn1 n USING (cid) JOIN ccn1 cn USING (ccid)
),
fmap1 AS (SELECT cid, ccid FROM (
    SELECT cid, ccid, ROW_NUMBER() OVER (
      PARTITION BY cid ORDER BY cos DESC, ccid ASC) AS rn FROM fcs1)
  WHERE rn = 1),
vcp1 AS (SELECT f.vec_id, cc1.ccid, unnest(f.v) AS a, unnest(cc1.ccv) AS b
         FROM fxl f, cc1),
vcd1 AS (SELECT vec_id, ccid, SUM(a * b) AS dot FROM vcp1 GROUP BY 1, 2),
vcs1 AS (
  SELECT d.vec_id, d.ccid,
         CAST(d.dot AS DOUBLE)
           / sqrt(CAST(n.nn AS DOUBLE) * CAST(cn.nn AS DOUBLE)) AS cos
  FROM vcd1 d JOIN norms n USING (vec_id) JOIN ccn1 cn USING (ccid)
),
vmap1 AS (SELECT vec_id, ccid FROM (
    SELECT vec_id, ccid, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, ccid ASC) AS rn FROM vcs1)
  WHERE rn <= {_SEM_NPROBE}),
vfp1 AS (SELECT f.vec_id, fm.cid, unnest(f.v) AS a, unnest(c1.cv) AS b
         FROM fxl f JOIN vmap1 vm USING (vec_id)
              JOIN fmap1 fm ON fm.ccid = vm.ccid
              JOIN c1 ON c1.cid = fm.cid),
vfd1 AS (SELECT vec_id, cid, SUM(a * b) AS dot FROM vfp1 GROUP BY 1, 2),
vfs1 AS (
  SELECT d.vec_id, d.cid,
         CAST(d.dot AS DOUBLE)
           / sqrt(CAST(n.nn AS DOUBLE) * CAST(cn.nn AS DOUBLE)) AS cos
  FROM vfd1 d JOIN norms n USING (vec_id) JOIN cn1 cn USING (cid)
),
a1 AS (SELECT vec_id, cid, cos FROM (
    SELECT vec_id, cid, cos, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn FROM vfs1)
  WHERE rn = 1)"""


def _dd_semdedup_refined_sql() -> str:
    """Full refined oracle: the shared assignment chain + the uncapped
    within-cell pair stage and keep rule (exactly x_semdedup's)."""
    from .round6b import _SEMDEDUP_THRESHOLD, _dd_two_level_cells_cte

    return f"""
WITH {_dd_two_level_cells_cte()},
{_dd_refined_chain_cte()},
mp AS (SELECT a.cid, a.vec_id AS i, b.vec_id AS j,
              unnest(fa.v) AS x, unnest(fb.v) AS y
       FROM a1 a JOIN a1 b ON a.cid = b.cid AND a.vec_id < b.vec_id
            JOIN fxl fa ON fa.vec_id = a.vec_id
            JOIN fxl fb ON fb.vec_id = b.vec_id),
pd AS (SELECT i, j, SUM(x * y) AS dot FROM mp GROUP BY 1, 2),
dropped AS (
  SELECT DISTINCT pd.j AS vec_id
  FROM pd JOIN norms na ON na.vec_id = pd.i
          JOIN norms nb ON nb.vec_id = pd.j
  WHERE CAST(pd.dot AS DOUBLE)
          / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE))
        >= {_SEMDEDUP_THRESHOLD}
)
SELECT a1.vec_id, a1.cid AS cell,
       (dropped.vec_id IS NULL) AS keep
FROM a1 LEFT JOIN dropped ON dropped.vec_id = a1.vec_id
"""


def _refined_cells(spark: SparkSession, sf_dir: str):
    """Refined-assignment substrate shared by x_semdedup_refined and
    round9's capped variant: one persisted frame
    (vec_id, cid, rcos, v, nn) — each vector's 1-Lloyd-round refined
    cell, its cosine to that cell's centroid (the capped variant's
    ranking key), and the fixed-point vector/norm the pair stage
    needs. Spark twin of ``_dd_refined_chain_cte``'s ``a1`` (with
    fxl/norms carried through the argmax agg)."""
    import math

    from ..caching import track_persist
    from ..functions.similarity import fixed_point
    from .llmdata import _emb
    from .round6b import (
        _SEM_NPROBE,
        _TL_CMP,
        _two_level_cells,
        coarse_cells,
    )

    emb, cells0 = _two_level_cells(spark, _emb(spark, sf_dir))
    fxv = track_persist(
        emb.select("vec_id", F.transform("embedding", fixed_point).alias("v"))
    )
    nn_self = F.aggregate(
        F.zip_with("v", "v", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    vn = track_persist(fxv.select("vec_id", nn_self.alias("nn")))

    # Lloyd round: per-(cell, dim) integer sums over the generation-0
    # cells -> floor-mean refined centroids (k x dim ints on driver)
    comp = (
        fxv.join(cells0.select("vec_id", "cid"), "vec_id")
        .select("cid", F.posexplode("v").alias("i", "x"))
        .groupBy("cid", "i")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_cid: dict = {}
    for r in comp:
        by_cid.setdefault(r["cid"], {})[r["i"]] = math.floor(r["s"] / r["cnt"])
    cents1 = [
        (cid, [dims[i] for i in sorted(dims)])
        for cid, dims in sorted(by_cid.items())
    ]
    cents1 = [(cid, cv, sum(c * c for c in cv)) for cid, cv in cents1]

    # two-level assignment against the REFINED centroids: coarse1 =
    # first kc1 refined cells by cid, same probe/argmax chain (and the
    # same tiebreaks) as _two_level_cells, centroid frames broadcast
    kc1 = coarse_cells(len(cents1))
    cdf = spark.createDataFrame(cents1, "cid long, cv array<bigint>, cnn long")
    ccdf = spark.createDataFrame(
        [(cid, cv, cnn) for cid, cv, cnn in sorted(cents1)[:kc1]],
        "ccid long, ccv array<bigint>, ccnn long",
    )

    def fxdot(a: str, b: str):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    fmap1 = (
        cdf.crossJoin(F.broadcast(ccdf))
        .select(
            "cid", "ccid",
            (
                fxdot("cv", "ccv").cast("double")
                / F.sqrt(
                    F.col("cnn").cast("double") * F.col("ccnn").cast("double")
                )
            ).alias("cos"),
        )
        .groupBy("cid")
        .agg(
            F.max_by(
                "ccid",
                F.struct(F.col("cos").alias("c"), (-F.col("ccid")).alias("nc")),
            ).alias("ccid")
        )
    )
    cmp = _TL_CMP
    scored_cc = (
        fxv.join(vn, "vec_id")
        .crossJoin(F.broadcast(ccdf))
        .select(
            "vec_id", "v", "nn",
            F.struct(
                (
                    fxdot("v", "ccv").cast("double")
                    / F.sqrt(
                        F.col("nn").cast("double") * F.col("ccnn").cast("double")
                    )
                ).alias("cos"),
                F.col("ccid").alias("ccid"),
            ).alias("s"),
        )
    )
    probed = (
        scored_cc.groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),
            F.first("nn").alias("nn"),
            F.collect_list("s").alias("__ss"),
        )
        .select(
            "vec_id", "v", "nn",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort(__ss, (x, y) -> {cmp}),"
                    f" 1, {_SEM_NPROBE}), t -> t.ccid)"
                )
            ).alias("ccid"),
        )
    )
    probe = fmap1.join(cdf, "cid")
    cells = (
        probed.join(F.broadcast(probe), "ccid")
        .select(
            "vec_id",
            "cid",
            (
                fxdot("v", "cv").cast("double")
                / F.sqrt(
                    F.col("nn").cast("double") * F.col("cnn").cast("double")
                )
            ).alias("cos"),
            "v",
            "nn",
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("cos").alias("c"), (-F.col("cid")).alias("nc"))
            ).alias("w"),
            # v/nn are functionally dependent on vec_id: carrying them
            # through the argmax agg saves the pair stage two shuffled
            # re-joins against the substrate frames
            F.first("v").alias("v"),
            F.first("nn").alias("nn"),
        )
        .select(
            "vec_id",
            (-F.col("w.nc")).alias("cid"),
            F.col("w.c").alias("rcos"),
            "v",
            "nn",
        )
    )
    # Lazy persist — an eager checkpoint of these embedding-array rows
    # measured slower at sf0.1 (see x_semdedup); the Lloyd collect()
    # above already materializes the assignment subtree sequentially,
    # so the downstream consumers read a warm cache. RE-MEASURED r17:
    # checkpointing this frame (fixed-point vector arrays) was again a
    # net LOSS — x_semdedup_refined 5.17 → 6.02 s, refined_capped
    # 4.91 → 6.94 s (plan_cost totals, same box A/B) — materializing
    # the 64-long arrays to executor storage costs more than the
    # cold-cache race it prevents. The r16 wide-payload rule stands.
    return track_persist(cells)


@query(
    "x_semdedup_refined",
    _dd_semdedup_refined_sql(),
    bench=True,
    doc=(
        "SemDeDup over a TRAINED quantizer: one deterministic Lloyd "
        "(k-means) round refines the adaptive-k prefix cells before "
        "the final cut — integer component sums, floor-mean centroids, "
        "members-only survival (the x_ann_ivf_trained arithmetic, "
        "queries/llmdata.py:1852) — so the cell partition tracks "
        "corpus density instead of the arrival prefix, the batch "
        "analog of the streaming retrain's _lloyd_refine rung whose "
        "measured drift A/B cut the post-shift leak 34% (SCALE.md). "
        "BOTH assignment passes are two-level (coarse probe -> fine "
        "within the top-4 probed groups): generation 0 IS x_semdedup's "
        "shared assignment, and the refined pass runs the same chain "
        "against the floor-mean centroids — measured dense-sf10 "
        "479 s flat -> two-level (SCALE.md r8). Training state is "
        "k x dim ints on the driver (the accepted k-means scalar "
        "state); the pair stage and keep rule are exactly "
        "x_semdedup's. The oracle unrolls the full round into CTE "
        "generations — training itself sits under the strict hash "
        "gate. (r9: assignment extracted into _refined_cells, shared "
        "with x_semdedup_refined_capped; results unchanged.)"
    ),
)
def x_semdedup_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .round6b import _SEMDEDUP_THRESHOLD

    m = _refined_cells(spark, sf_dir)
    a = m.select(
        F.col("cid").alias("ca"), F.col("vec_id").alias("i"),
        F.col("v").alias("va"), F.col("nn").alias("na"),
    )
    b = m.select(
        F.col("cid").alias("cb"), F.col("vec_id").alias("j"),
        F.col("v").alias("vb"), F.col("nn").alias("nb"),
    )
    pair_dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dropped = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("i") < F.col("j")))
        .filter(
            pair_dot.cast("double")
            / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
            >= _SEMDEDUP_THRESHOLD
        )
        .select(F.col("j").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return m.join(dropped, "vec_id", "left_outer").select(
        "vec_id",
        F.col("cid").alias("cell"),
        F.col("__dropped").isNull().alias("keep"),
    )


# ---------------------------------------------------------------------------
# x_image_gif_stats — stdlib-only GIF87a decode (real variable-width LZW)
# ---------------------------------------------------------------------------

_GIF_W = "8 + doc_id % 13"
_GIF_H = "5 + doc_id % 7"

_XGIF_SQL = f"""
WITH m AS (
  SELECT doc_id, {_GIF_W} AS w, {_GIF_H} AS h FROM documents
),
px AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w * h - 1)) AS k FROM m
),
s AS (
  SELECT doc_id, w, h,
         SUM((7 * ((doc_id + k) % 256)) % 256) AS sum_r,
         SUM((11 * ((doc_id + k) % 256)) % 256) AS sum_g,
         SUM((13 * ((doc_id + k) % 256)) % 256) AS sum_b
  FROM px GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(sum_r AS BIGINT) AS sum_r,
       CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b
FROM s
"""


@query(
    "x_image_gif_stats",
    _XGIF_SQL,
    doc=(
        "REAL GIF decode with NO codec library: deterministic "
        "256-color GIF87a payloads (global palette, genuine greedy "
        "longest-match LZW with variable-width codes) are synthesized "
        "per doc, then fully decoded inside mapInPandas — container "
        "parse, from-scratch LSB-first LZW decoder (CLEAR/END codes, "
        "dictionary growth with the width bump at 2^w, the KwKwK "
        "special case, 4096-entry reset), palette mapping, per-channel "
        "pixel sums. The oracle recomputes the sums analytically from "
        "the palette/index generative formulas, so a single wrong bit "
        "anywhere in the LZW path breaks the hash gate — a genuinely "
        "different compression algorithm from the PNG twin's deflate "
        "(functions/multimodal.py:synthesize_gif/_gif_lzw_decompress). "
        "Payloads are built and consumed executor-side in Arrow "
        "batches and never shuffle; output is 7 small columns per "
        "image — the 100 TB media posture (move features, not bytes)."
    ),
)
def x_image_gif_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from ..functions.multimodal import extract_image_features, synthesize_gif

    def _make_gif(mid, w, h):
        return pd.Series(
            [synthesize_gif(int(m), int(a), int(b)) for m, a, b in zip(mid, w, h)]
        )

    make_gif = pandas_udf(_make_gif, "binary", PandasUDFType.SCALAR)

    d = _docs(spark, sf_dir).select(F.col("doc_id").alias("media_id"))
    media = d.select(
        "media_id",
        make_gif(
            F.col("media_id"),
            F.expr(_GIF_W.replace("doc_id", "media_id")).cast("int"),
            F.expr(_GIF_H.replace("doc_id", "media_id")).cast("int"),
        ).alias("payload"),
    )
    return extract_image_features(media)


# ---------------------------------------------------------------------------
# x_cms_calibration — full-vocabulary Count-Min error scorecard
# ---------------------------------------------------------------------------

# e * 1e9 as an integer: the CMS guarantee bound e*N/w evaluated in
# exact integer arithmetic (HUGEINT / DECIMAL(38,0)) — a libm exp(1)
# could differ in the last ulp between engines and flip a term sitting
# exactly on the bound.
_E_1E9 = 2718281828

_XCMSCAL_SQL = f"""
WITH tok AS (
  SELECT unnest({{toks}}) AS term FROM documents
),
exact AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM tok GROUP BY term
),
cells AS (
  SELECT t.i AS row_idx,
         CAST('0x' || substr(md5('cms' || CAST(t.i AS VARCHAR) || ':' || term),
                             1, 7) AS BIGINT) % {{w}} AS col_idx,
         CAST(SUM(exact_cnt) AS BIGINT) AS cnt
  FROM exact, unnest(generate_series(0, {{d}} - 1)) AS t(i)
  GROUP BY 1, 2
),
probes AS (
  SELECT exact.term, exact.exact_cnt, t.i AS row_idx,
         CAST('0x' || substr(md5('cms' || CAST(t.i AS VARCHAR) || ':' || term),
                             1, 7) AS BIGINT) % {{w}} AS col_idx
  FROM exact, unnest(generate_series(0, {{d}} - 1)) AS t(i)
),
est AS (
  SELECT p.term, p.exact_cnt,
         CAST(MIN(c.cnt) AS BIGINT) - p.exact_cnt AS over_cnt
  FROM probes p JOIN cells c USING (row_idx, col_idx)
  GROUP BY p.term, p.exact_cnt
),
tot AS (SELECT CAST(SUM(exact_cnt) AS BIGINT) AS total_tokens FROM exact),
bnd AS (SELECT CAST(CAST({_E_1E9} AS HUGEINT) * total_tokens
               // {{wdiv}} AS BIGINT) AS bound
        FROM tot)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       (SELECT total_tokens FROM tot) AS total_tokens,
       CAST(SUM(CASE WHEN over_cnt = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS zero_err_terms,
       CAST(MAX(over_cnt) AS BIGINT) AS max_over,
       CAST(CASE WHEN COUNT(*) = 0 THEN 0
            ELSE CAST(SUM(over_cnt) AS HUGEINT) * 1000000 // COUNT(*) END
            AS BIGINT) AS mean_over_ppm,
       (SELECT bound FROM bnd) AS bound,
       CAST(SUM(CASE WHEN over_cnt <= (SELECT bound FROM bnd)
                THEN 1 ELSE 0 END) AS BIGINT) AS within_bound
FROM est
"""


def _dd_cms_cal_sql() -> str:
    from ..functions.sketches import CMS_D, CMS_W
    from .round7b import _CMS_TOKS

    return _XCMSCAL_SQL.format(
        toks=_CMS_TOKS, d=CMS_D, w=CMS_W, wdiv=1000000000 * CMS_W
    )


@query(
    "x_cms_calibration",
    _dd_cms_cal_sql(),
    doc=(
        "Count-Min error scorecard over the FULL vocabulary (the "
        "heavy-hitters query probes only the top 20): per-term "
        "overestimate = min-of-cells - exact, aggregated into one row "
        "— zero-error share, max/mean overestimate, and the fraction "
        "of terms within the theoretical Markov bound e*N/w that the "
        "Cormode-Muthukrishnan guarantee says >= 1 - e^-d of terms "
        "must satisfy (e carried as an exact integer 2718281828/1e9 in "
        "HUGEINT/DECIMAL(38,0) arithmetic — a libm exp(1) ulp "
        "difference could flip a boundary term between engines). "
        "Completes the sketch eval tier alongside x_ann_recall_eval / "
        "x_semdedup_recall_eval / x_lsh_dedup_eval: every approximate "
        "structure ships with a measured-quality query under the same "
        "hash gate. Scale: vocab-contracted stream, |vocab| x 4 probe "
        "rows against the broadcast <=1024-cell sketch, one final agg."
    ),
)
def x_cms_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from ..functions.sketches import CMS_W, cms_cells, cms_estimates
    from ..sources.parquet_io import read_table

    d = read_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), " +"), lambda t: t != ""
    )
    exact = track_persist(
        d.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    cells = cms_cells(exact, "term", "exact_cnt")
    est = (
        cms_estimates(cells, exact.select("term"))
        .join(exact, "term")
        .select(
            "term",
            "exact_cnt",
            (F.col("cms_estimate") - F.col("exact_cnt")).alias("over_cnt"),
        )
    )
    tot = exact.agg(
        F.sum("exact_cnt").cast("long").alias("total_tokens")
    )
    bnd = tot.select(
        "total_tokens",
        F.expr(
            f"CAST(CAST({_E_1E9} AS DECIMAL(38,0)) * total_tokens"
            f" div {1000000000 * CMS_W} AS BIGINT)"
        ).alias("bound"),
    )
    agg = est.crossJoin(F.broadcast(bnd)).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.first("total_tokens").alias("total_tokens"),
        F.sum(F.when(F.col("over_cnt") == 0, 1).otherwise(0))
        .cast("long")
        .alias("zero_err_terms"),
        F.max("over_cnt").cast("long").alias("max_over"),
        F.expr(
            "CASE WHEN COUNT(1) = 0 THEN 0"
            " ELSE CAST(SUM(over_cnt) AS DECIMAL(38,0)) * 1000000"
            " div COUNT(1) END"
        )
        .cast("long")
        .alias("mean_over_ppm"),
        F.first("bound").alias("bound"),
        F.sum(
            F.when(F.col("over_cnt") <= F.col("bound"), 1).otherwise(0)
        )
        .cast("long")
        .alias("within_bound"),
    )
    return agg
