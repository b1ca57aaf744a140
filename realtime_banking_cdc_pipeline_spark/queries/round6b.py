"""Round-6 LLM-data + fraud-analytics additions (reference analog: the
curation/fraud stages its Silver/Gold marts feed, `models/silver/*.sql`,
`models/gold/fact_transactions.sql`; the reference has no embedding or
retrieval ops at all — these are the training-data-pipeline extensions
the survey calls for):

- x_semdedup / x_semdedup_diverse — cluster-scoped embedding dedup
  (SemDeDup, Abbas et al. 2023, arXiv:2303.09540), keep-lowest-id and
  keep-least-prototypical-per-component variants.
- x_bm25_search — BM25 lexical retrieval (log-free rational idf).
- x_bigram_likelihood — interpolated bigram-LM fluency scoring.
- x_quality_classifier — hashed-feature linear model serving.
- x_chunk_documents — context-window chunking (shuffle-free).
- x_temperature_mix — temperature-reweighted mixture sampling.
- x_rank_fusion_rrf — hybrid retrieval via reciprocal-rank fusion.
- a_structuring_screen — AML smurfing detection (range-frame burst).

Determinism follows queries/_det.py house rules: every similarity /
score is exact integer fixed-point arithmetic (2^20 scale) with at most
one trailing double division written in the same IEEE op order on both
engines; no libm log anywhere (BM25's idf uses the exact rational
(N - df + 1/2)/(df + 1/2), fixed-point-quantized, instead of its ln —
same ordering intent, cross-engine exact; swap ln back in at deployment
where bit-equality across engines is not required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import cosine_against, fx_dot
from ..functions.text import ws_tokens
from ..sources.parquet_io import read_table
from .llmdata import (
    _ADAPTIVE_CELLS_SQL,
    _dd_ivf_sql,
    _emb,
    _FXQ,
    adaptive_cells,
)
from .registry import query

# ---------------------------------------------------------------------------
# x_semdedup — SemDeDup: k-means-cell-scoped embedding near-dup removal
# ---------------------------------------------------------------------------

# Fixture threshold: the driver embeddings are near-orthogonal random
# vectors (within-cell cosine tops out ~0.49 at sf0.01), so the fixture
# bar sits where the machinery has real work; production semantic dedup
# on trained text embeddings runs ~0.95+ (SemDeDup paper table 1), and
# the amplified sfN replicas (gen_sf.py: exact / perturbed copies,
# cos ≈ 1.0) are exactly that regime.
_SEMDEDUP_THRESHOLD = 0.35


def coarse_cells(k: int) -> int:
    """Power-of-two coarse-quantizer size ≈ sqrt(k), floor 4 — the
    first level of the two-level (coarse→fine) cell assignment."""
    return max(4, 1 << (int(k).bit_length() // 2))


# DuckDB twin of :func:`coarse_cells` over a column named ``k``.
_COARSE_CELLS_SQL = "GREATEST(4, 1 << (length(bin(CAST(k AS BIGINT))) // 2))"

# Coarse groups probed per vector. Single-probe assignment measured a
# 2.2× worse sum(cell²) pair bound on the replica-dense sf10 corpus
# (max cell 1100 → 3800): restricting each vector to one coarse
# region quantizes too coarsely where mass concentrates. Probing the
# top-4 coarse groups restores near-flat cell quality while keeping
# assignment ≈ N·(kc + 4k/kc) ≈ 8× under the flat N·k.
_SEM_NPROBE = 4

# Struct comparator for the coarse-probe top-nprobe array sort:
# (cos DESC, ccid ASC) — the ONE tiebreak rule every two-level
# assignment (batch, refined, streaming) and its oracle must share.
_TL_CMP = (
    "CASE WHEN x.cos > y.cos THEN -1 WHEN x.cos < y.cos THEN 1"
    " WHEN x.ccid < y.ccid THEN -1 WHEN x.ccid > y.ccid THEN 1"
    " ELSE 0 END"
)

def _two_level_cells(
    spark: SparkSession,
    emb: DataFrame,
    fine_probes: int | None = None,
    k_override: int | None = None,
    n_rows: int | None = None,
):
    """Two-level (coarse→fine) quantizer assignment for the SemDeDup
    family: ``(emb, cells)`` where cells = (vec_id, cid, ccos) — each
    vector's fine cell and its cosine to that cell's centroid. With
    ``fine_probes=p`` additionally returns ``probes`` = (vec_id, cid)
    rows for each vector's top-``p`` fine cells by the same
    (cos DESC, cid ASC) rule — the IVF multi-probe candidate regions
    (rank 1 is the ``cells`` assignment itself).

    The flat rule scored every vector against all k ≈ sqrt(N) fine
    centroids: assignment kN + within-cell pairs N²/k bottoms out at
    O(N^1.5) with the ASSIGNMENT stage dominating at 10^10+ docs. Here
    each vector scores the kc ≈ sqrt(k) ≈ N^(1/4) coarse centroids,
    then only the fine centroids whose nearest coarse centroid matches
    (≈ k/kc on average): ~2·N·sqrt(k) scores instead of N·k — at 200k
    vectors that is ~10M vs ~100M cosine evaluations, and the pair
    stage bound (cells stay ≈ sqrt(N)-sized) is unchanged.

    Deterministic and oracle-twinned: fine centroids are the first k
    vectors, coarse the first kc (a PREFIX of the fine set, so every
    selectable coarse cell contains its own fine twin and no probe
    group is empty); all nearest-of rules maximize (cos, -id) with the
    exact fixed-point cosine, identically in the generated SQL
    (`_dd_two_level_cells_cte`).

    The corpus count is the only driver-side state (one scalar, the
    same pattern as the high-water-mark collect); broadcast state is
    kc + k centroid rows ≈ sqrt(N)·dim floats (1e9 vectors → ~8 MB at
    dim 64). The input is rebalanced up to the session parallelism
    when the file layout under-splits (measured: a 2-row-group parquet
    starves local[32] on the assignment map stage — SCALE.md
    `semdedup_cell_scaling`); well-partitioned inputs skip the shuffle.
    """
    # ``n_rows`` lets a caller that already holds the corpus count skip
    # the count job (the capped-mknn second-quantizer call — one fewer
    # eager driver action per build, guide §2.4 fewer actions)
    n = emb.count() if n_rows is None else int(n_rows)
    # ``k_override`` replaces the adaptive vec_id THRESHOLD (centroids
    # are rows with vec_id < k, so k's magnitude is a threshold, not an
    # exact count — callers compensate for sparse id ranges themselves)
    k = adaptive_cells(n) if k_override is None else int(k_override)
    kc = coarse_cells(k)
    par = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    ccents = emb.filter(F.col("vec_id") < kc).select(
        F.col("vec_id").alias("ccid"), F.col("embedding").alias("ccv")
    ).withColumn("ccnn", fx_dot(F.col("ccv"), F.col("ccv")))
    # fine -> coarse: k x kc scores, all broadcast-side tiny
    fmap = (
        cents.crossJoin(F.broadcast(ccents.select("ccid", "ccv")))
        .select(
            "cid", "ccid",
            cosine_against(F.col("ccv"), F.col("cv")).alias("cos"),
        )
        .groupBy("cid")
        .agg(
            F.max_by(
                "ccid",
                F.struct(F.col("cos").alias("c"), (-F.col("ccid")).alias("nc")),
            ).alias("ccid")
        )
    )
    # vector -> top _SEM_NPROBE coarse groups in ONE exchange: the
    # N x kc coarse scores partial-aggregate map-side into a kc-entry
    # list per vector (the embedding rides along once via first()), the
    # top-nprobe pick is an array sort over that small list, and the
    # fine stage below reuses the groupBy partitioning — no window
    # sort, no embedding re-join. (Measured: the row_number-window
    # form's extra exchanges doubled x_semdedup at duplicate-light
    # sf0.1 where stage overhead dominates.)
    cmp = _TL_CMP
    scored_cc = (
        emb.withColumn("__nn", fx_dot(F.col("embedding"), F.col("embedding")))
        .crossJoin(F.broadcast(ccents))
        .select(
            "vec_id", "embedding", "__nn",
            F.struct(
                (
                    fx_dot(F.col("ccv"), F.col("embedding")).cast("double")
                    / F.sqrt(
                        F.col("__nn").cast("double")
                        * F.col("ccnn").cast("double")
                    )
                ).alias("cos"),
                F.col("ccid").alias("ccid"),
            ).alias("s"),
        )
    )
    probed = (
        scored_cc.groupBy("vec_id")
        .agg(
            F.first("embedding").alias("embedding"),
            F.first("__nn").alias("__nn"),
            F.collect_list("s").alias("__ss"),
        )
        .select(
            "vec_id", "embedding", "__nn",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort(__ss, (x, y) -> {cmp}),"
                    f" 1, {_SEM_NPROBE}), t -> t.ccid)"
                )
            ).alias("ccid"),
        )
    )
    # vector -> fine, probing ONLY the matched coarse groups (~
    # nprobe*k/kc fine centroids per vector; the groups are disjoint --
    # fmap maps each fine centroid to exactly one coarse -- so no
    # duplicate candidates); probe table is k rows -> broadcast; the
    # final argmax agg reuses the groupBy partitioning (no exchange).
    probe = fmap.join(
        cents.withColumn("cnn", fx_dot(F.col("cv"), F.col("cv"))), "cid"
    )
    scored_fine = probed.join(F.broadcast(probe), "ccid").select(
        "vec_id",
        "cid",
        (
            fx_dot(F.col("cv"), F.col("embedding")).cast("double")
            / F.sqrt(
                F.col("__nn").cast("double") * F.col("cnn").cast("double")
            )
        ).alias("cos"),
    )
    if fine_probes is not None:
        # two consumers of the fine scores (argmax cell + top-nprobe
        # probe set) — persist so the probe join isn't recomputed
        from ..caching import track_persist

        scored_fine = track_persist(scored_fine)
    win = scored_fine.groupBy("vec_id").agg(
        F.max(
            F.struct(F.col("cos").alias("c"), (-F.col("cid")).alias("nc"))
        ).alias("w")
    )
    cells = win.select(
        "vec_id", (-F.col("w.nc")).alias("cid"), F.col("w.c").alias("ccos")
    )
    if fine_probes is None:
        return emb, cells
    # top-``fine_probes`` fine cells per vector by the assignment rule
    # (cos DESC, cid ASC) — the IVF multi-probe candidate regions the
    # capped pair stages rescue overflow vectors with. Same
    # collect+array_sort shape as the coarse stage (no window sort);
    # rank 1 is by construction the vector's ``cells`` assignment.
    fine_cmp = (
        "CASE WHEN x.cos > y.cos THEN -1 WHEN x.cos < y.cos THEN 1"
        " WHEN x.cid < y.cid THEN -1 WHEN x.cid > y.cid THEN 1"
        " ELSE 0 END"
    )
    probes = (
        scored_fine.select(
            "vec_id", F.struct(F.col("cos"), F.col("cid")).alias("s")
        )
        .groupBy("vec_id")
        .agg(F.collect_list("s").alias("__ss"))
        .select(
            "vec_id",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort(__ss, (x, y) -> {fine_cmp}),"
                    f" 1, {int(fine_probes)}), t -> t.cid)"
                )
            ).alias("cid"),
        )
    )
    return emb, cells, probes


def _dd_two_level_cells_cte(
    src: str = "embeddings",
    fine_probes: int | None = None,
    k_sql: str | None = None,
    suffix: str = "",
) -> str:
    """Shared oracle CTE chain deriving the two-level cell assignment —
    ends at ``cells (vec_id, cid, ccos)``; also defines ``e`` and
    ``norms`` for downstream pair stages. Exact SQL twin of
    :func:`_two_level_cells` (same adaptive k, same coarse rule, same
    (cos DESC, id ASC) tiebreaks, same fixed-point cosine).

    ``src`` names the (vec_id, embedding) relation the assignment runs
    over — the raw ``embeddings`` table by default, or an earlier CTE
    (e.g. the distinct-embedding ``reps`` contraction of
    round9.x_mutual_knn_clusters). ``fine_probes=p`` additionally
    defines ``probes (vec_id, cid)`` — each vector's top-``p`` fine
    cells by the same rule. ``k_sql`` overrides the fine-centroid
    vec_id threshold expression (aggregate SQL over ``src``; default
    adaptive k ~ sqrt(N)); ``suffix`` renames every CTE so two
    instantiations can coexist in one WITH (the capped mutual-kNN twin
    derives BOTH the house cells and a finer candidate quantizer).
    Defaults stay byte-identical to the r10 output."""
    fx = _FXQ.format
    k_expr = _ADAPTIVE_CELLS_SQL if k_sql is None else k_sql
    s = suffix
    out = f"""nk{s} AS (SELECT {k_expr} AS k FROM {src}),
nc{s} AS (SELECT k, {_COARSE_CELLS_SQL} AS kc FROM nk{s}),
e{s} AS (SELECT vec_id, embedding FROM {src}),
c{s} AS (SELECT vec_id AS cid, embedding AS cv FROM {src}, nc{s}
      WHERE vec_id < nc{s}.k),
cc{s} AS (SELECT vec_id AS ccid, embedding AS ccv FROM {src}, nc{s}
       WHERE vec_id < nc{s}.kc),
norms{s} AS (SELECT vec_id, SUM({fx(v='v')} * {fx(v='v')}) AS nn
          FROM (SELECT vec_id, unnest(embedding) AS v FROM e{s}) GROUP BY 1),
cnorms{s} AS (SELECT cid, SUM({fx(v='v')} * {fx(v='v')}) AS nn
           FROM (SELECT cid, unnest(cv) AS v FROM c{s}) GROUP BY 1),
ccnorms{s} AS (SELECT ccid, SUM({fx(v='v')} * {fx(v='v')}) AS nn
            FROM (SELECT ccid, unnest(ccv) AS v FROM cc{s}) GROUP BY 1),
fcp{s} AS (SELECT c{s}.cid, cc{s}.ccid, unnest(c{s}.cv) AS a, unnest(cc{s}.ccv) AS b
        FROM c{s}, cc{s}),
fcd{s} AS (SELECT cid, ccid, SUM({fx(v='a')} * {fx(v='b')}) AS dot
        FROM fcp{s} GROUP BY 1, 2),
fcs{s} AS (
  SELECT d.cid, d.ccid,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(n.nn AS DOUBLE) * CAST(cn.nn AS DOUBLE)) AS cos
  FROM fcd{s} d JOIN cnorms{s} n USING (cid) JOIN ccnorms{s} cn USING (ccid)
),
fmap{s} AS (SELECT cid, ccid FROM (
    SELECT cid, ccid, ROW_NUMBER() OVER (
      PARTITION BY cid ORDER BY cos DESC, ccid ASC) AS rn FROM fcs{s})
  WHERE rn = 1),
vcp{s} AS (SELECT e{s}.vec_id, cc{s}.ccid, unnest(e{s}.embedding) AS a,
               unnest(cc{s}.ccv) AS b
        FROM e{s}, cc{s}),
vcd{s} AS (SELECT vec_id, ccid, SUM({fx(v='a')} * {fx(v='b')}) AS dot
        FROM vcp{s} GROUP BY 1, 2),
vcs{s} AS (
  SELECT d.vec_id, d.ccid,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(n.nn AS DOUBLE) * CAST(cn.nn AS DOUBLE)) AS cos
  FROM vcd{s} d JOIN norms{s} n USING (vec_id) JOIN ccnorms{s} cn USING (ccid)
),
vmap{s} AS (SELECT vec_id, ccid FROM (
    SELECT vec_id, ccid, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, ccid ASC) AS rn FROM vcs{s})
  WHERE rn <= {_SEM_NPROBE}),
vfp{s} AS (SELECT e{s}.vec_id, f.cid, unnest(e{s}.embedding) AS a, unnest(c{s}.cv) AS b
        FROM e{s} JOIN vmap{s} vm USING (vec_id)
               JOIN fmap{s} f ON f.ccid = vm.ccid
               JOIN c{s} ON c{s}.cid = f.cid),
vfd{s} AS (SELECT vec_id, cid, SUM({fx(v='a')} * {fx(v='b')}) AS dot
        FROM vfp{s} GROUP BY 1, 2),
vfs{s} AS (
  SELECT d.vec_id, d.cid,
         CAST(d.dot AS DOUBLE) / sqrt(CAST(n.nn AS DOUBLE) * CAST(cn.nn AS DOUBLE)) AS cos
  FROM vfd{s} d JOIN norms{s} n USING (vec_id) JOIN cnorms{s} cn USING (cid)
),
cells{s} AS (SELECT vec_id, cid, cos AS ccos FROM (
    SELECT vec_id, cid, cos, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn FROM vfs{s})
  WHERE rn = 1)"""
    if fine_probes is not None:
        out += f""",
probes{s} AS (SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn FROM vfs{s})
  WHERE rn <= {int(fine_probes)})"""
    return out


def _dd_semdedup_sql() -> str:
    fx = _FXQ.format
    return f"""
WITH {_dd_two_level_cells_cte()},
m AS (SELECT cells.vec_id, cells.cid, e.embedding
      FROM cells JOIN e USING (vec_id)),
mp AS (SELECT x.cid, x.vec_id AS i, y.vec_id AS j,
              unnest(x.embedding) AS a, unnest(y.embedding) AS b
       FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id),
pdots AS (SELECT cid, i, j, SUM({fx(v='a')} * {fx(v='b')}) AS dot
          FROM mp GROUP BY 1, 2, 3),
dropped AS (
  SELECT DISTINCT p.j AS vec_id
  FROM pdots p JOIN norms na ON na.vec_id = p.i
               JOIN norms nb ON nb.vec_id = p.j
  WHERE CAST(p.dot AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE))
        >= {_SEMDEDUP_THRESHOLD}
)
SELECT m.vec_id, m.cid AS cell,
       (dropped.vec_id IS NULL) AS keep
FROM m LEFT JOIN dropped ON dropped.vec_id = m.vec_id
"""


@query(
    "x_semdedup",
    _dd_semdedup_sql(),
    bench=True,
    doc=(
        "SemDeDup (arXiv:2303.09540): assign every embedding to its "
        "nearest coarse-quantizer cell, compare pairs ONLY within a "
        "cell, and drop any vector whose cosine to a lower-id cell-"
        "mate reaches the threshold (deterministic keep-lowest-id "
        "variant of the paper's keep-one rule). The all-pairs problem "
        "never materializes: candidate pairs are bounded by "
        "sum(cell_size^2), the cell count ADAPTS to the corpus "
        "(k = max(16, 2^(bitlen(N)//2)) ~ sqrt(N)), and assignment is "
        "TWO-LEVEL (coarse kc ~ sqrt(k) probe, then fine within the "
        "probed group): ~2*N*sqrt(k) cosine evaluations instead of the "
        "flat rule's N*k — the stage that dominated at 10^10+ docs — "
        "derived identically in the Spark fn and the generated oracle, "
        "so the same query survives any sf (measured: pinned k=16 "
        "TIMEOUT>600 s at 200k vectors; adaptive k finishes — "
        "SCALE.md). Centroids broadcast (k x dim, bounded: sqrt(N) "
        "growth); the within-cell self-join shuffles ids+vectors "
        "on cid once; the dup verdict is one distinct + left anti "
        "shape. Cosines are exact fixed-point dots with one trailing "
        "double division — bit-identical across engines, so the "
        "threshold compare cannot straddle."
    ),
)
def x_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist

    emb, cells = _two_level_cells(spark, _emb(spark, sf_dir))
    # per-member squared norm computed ONCE (pair-time cosine is then a
    # single cross dot + one division — not three array reductions).
    # Lazy persist, NOT an eager checkpoint: an r16 A/B measured the
    # checkpoint variant 2.2x SLOWER at sf0.1 — materializing the
    # embedding-array rows to storage costs more than the cold-cache
    # recompute it prevents (the narrow-row frames elsewhere in this
    # round go the other way).
    m = track_persist(
        cells.select("vec_id", "cid")
        .join(emb, "vec_id")
        .select("vec_id", "cid", "embedding")
        .withColumn("nn", fx_dot(F.col("embedding"), F.col("embedding")))
    )
    a = m.select(
        F.col("cid").alias("ca"),
        F.col("vec_id").alias("i"),
        F.col("embedding").alias("ea"),
        F.col("nn").alias("na"),
    )
    b = m.select(
        F.col("cid").alias("cb"),
        F.col("vec_id").alias("j"),
        F.col("embedding").alias("eb"),
        F.col("nn").alias("nb"),
    )
    pair_cos = fx_dot(F.col("eb"), F.col("ea")).cast("double") / F.sqrt(
        F.col("ea_nn_prod")
    )
    dropped = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("i") < F.col("j")))
        .withColumn(
            "ea_nn_prod", F.col("na").cast("double") * F.col("nb").cast("double")
        )
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
# x_bm25_search — BM25 top-k lexical retrieval
# ---------------------------------------------------------------------------

_BM25_QUERY = ("spark", "window", "merge")
_BM25_K = 20
_BM25_SCALE = 1 << 20
# k1 = 1.2 = 6/5, b = 0.75 = 3/4 (the standard Robertson defaults),
# kept as exact rationals so the whole score is integer arithmetic.


def _dd_bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), ' +'),
                            x -> x <> '')) AS term
  FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
corpus AS (SELECT CAST(SUM(dl) AS BIGINT) AS tl,
                  CAST(COUNT(*) AS BIGINT) AS n FROM dl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok WHERE term IN ({terms}) GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
idf AS (SELECT term,
               CAST(({_BM25_SCALE} * (2 * corpus.n - 2 * df.df + 1))
                    // (2 * df.df + 1) AS BIGINT) AS idf_fp
        FROM df, corpus),
scored AS (
  SELECT tf.doc_id,
         CAST(SUM(
           (idf.idf_fp * (({_BM25_SCALE} * 44 * tf.tf * corpus.tl)
              // (20 * corpus.tl * tf.tf + 6 * corpus.tl + 18 * dl.dl * corpus.n)))
           // {_BM25_SCALE}
         ) AS BIGINT) AS score_fp,
         CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), corpus
  GROUP BY 1
)
SELECT doc_id, n_hit, score_fp
FROM scored
ORDER BY score_fp DESC, doc_id ASC
LIMIT {_BM25_K}
"""


@query(
    "x_bm25_search",
    _dd_bm25_sql(),
    bench=True,
    doc=(
        "BM25 top-k retrieval (k1=6/5, b=3/4 as exact rationals): "
        "tf/df/doc-length statistics are three map-side-combined "
        "aggregates; the tf pass filters to the query's terms BEFORE "
        "aggregating, so the inverted-index slice — not the corpus — "
        "is what flows into scoring; the per-term idf and corpus "
        "scalars broadcast (bounded: |query| rows / one row); top-k "
        "is TakeOrdered, no global sort. The tf saturation term "
        "tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) is multiplied through "
        "by 20*TL into a single exact integer rational, then "
        "fixed-point-quantized — deterministic across engines where "
        "libm ln/double sums are not (the ln-idf of textbook BM25 is "
        "a monotone reweighting swapped in at deployment). Fixed-"
        "point products stay under 2^63 to ~10^10 corpus tokens; "
        "beyond that, widen the accumulators to DECIMAL(38,0) as the "
        "tfidf norms do."
    ),
)
def x_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.transform(ws_tokens("text"), F.lower)).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.sum("dl").cast("bigint").alias("tl"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    tf = (
        tok.filter(F.col("term").isin(*_BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = df.crossJoin(F.broadcast(corpus)).select(
        "term",
        F.expr(
            f"CAST(({_BM25_SCALE} * (2 * n - 2 * df + 1)) div (2 * df + 1) AS BIGINT)"
        ).alias("idf_fp"),
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.expr(
                f"CAST((idf_fp * (({_BM25_SCALE} * 44 * tf * tl)"
                " div (20 * tl * tf + 6 * tl + 18 * dl * n)))"
                f" div {_BM25_SCALE} AS BIGINT)"
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hit"),
            F.sum("contrib").cast("bigint").alias("score_fp"),
        )
        .select("doc_id", "n_hit", "score_fp")
        .orderBy(F.col("score_fp").desc(), F.col("doc_id").asc())
        .limit(_BM25_K)
    )


# ---------------------------------------------------------------------------
# x_bigram_likelihood — interpolated bigram-LM doc score
# ---------------------------------------------------------------------------

_BLM_SCALE = 1 << 20
# interpolation lambda = 3/4 bigram, 1/4 unigram, as exact rationals:
# p(w2|w1) = (3*B(w1,w2)*C + U(w2)*U(w1)) / (4*U(w1)*C)

_XBLM_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_transform(
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> ''),
    x -> lower(x)) AS t
  FROM documents
),
big AS (
  SELECT doc_id, unnest(list_transform(range(2, len(t) + 1),
                        i -> t[i-1] || ' ' || t[i])) AS bg
  FROM toks
),
uni AS (SELECT doc_id, unnest(t) AS w FROM toks),
bt AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS bf FROM big GROUP BY 1, 2),
bc AS (SELECT bg, CAST(SUM(bf) AS BIGINT) AS b FROM bt GROUP BY 1),
uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS u FROM uni GROUP BY 1),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM uni),
p AS (
  SELECT bc.bg,
         CAST(({_BLM_SCALE} * (3 * bc.b * total.c + u2.u * u1.u))
              // (4 * u1.u * total.c) AS BIGINT) AS p_fp
  FROM bc
  JOIN uc u1 ON u1.w = string_split(bc.bg, ' ')[1]
  JOIN uc u2 ON u2.w = string_split(bc.bg, ' ')[2],
  total
)
SELECT bt.doc_id,
       CAST(SUM(bt.bf) AS BIGINT) AS n_bigrams,
       CAST(CAST(SUM(bt.bf * p.p_fp) AS BIGINT) // CAST(SUM(bt.bf) AS BIGINT) AS BIGINT) AS score_fp
FROM bt JOIN p ON p.bg = bt.bg
GROUP BY bt.doc_id
"""


@query(
    "x_bigram_likelihood",
    _XBLM_SQL,
    doc=(
        "Interpolated bigram-LM doc score (KenLM-filter proxy: CCNet/"
        "Gopher-style fluency signal, learned from the corpus itself): "
        "p(w2|w1) = 3/4 * B(w1,w2)/U(w1) + 1/4 * U(w2)/C as ONE exact "
        "integer rational per bigram, 2^20 fixed point, mean over each "
        "doc's bigram positions. Three map-side-combined count aggs "
        "(doc-bigram, corpus-bigram, corpus-unigram); the bigram->"
        "unigram probability joins shuffle on their term keys with NO "
        "broadcast hint (vocab is unbounded — the x_top_terms rule); "
        "the token-total is the only broadcast scalar. Products stay "
        "under 2^63 to ~10^6-token corpora per the header analysis; "
        "widen accumulators to DECIMAL(38,0) past that."
    ),
)
def x_bigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.transform(ws_tokens("text"), F.lower).alias("t")
    )
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(2, size(t)), i -> concat_ws(' ', t[i-2], t[i-1]))")
        ).alias("bg"),
    )
    uni = toks.select("doc_id", F.explode("t").alias("w"))
    bt = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).cast("bigint").alias("bf"))
    bc = bt.groupBy("bg").agg(F.sum("bf").cast("bigint").alias("b"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("u"))
    total = uni.agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("u").alias("u1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("u").alias("u2"))
    p = (
        bc.withColumn("w1", F.split("bg", " ").getItem(0))
        .withColumn("w2", F.split("bg", " ").getItem(1))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bg",
            F.expr(
                f"CAST(({_BLM_SCALE} * (3 * b * c + u2 * u1))"
                " div (4 * u1 * c) AS BIGINT)"
            ).alias("p_fp"),
        )
    )
    return (
        bt.join(p, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("bf").cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST(CAST(SUM(bf * p_fp) AS BIGINT) div CAST(SUM(bf) AS BIGINT) AS BIGINT)"
            ).alias("score_fp"),
        )
    )


# ---------------------------------------------------------------------------
# x_semdedup_diverse — SemDeDup with the paper's keep rule: per dup
# COMPONENT, keep the member LEAST similar to its cell centroid
# ---------------------------------------------------------------------------


def _dd_semdedup_diverse_sql() -> str:
    fx = _FXQ.format
    return f"""
WITH RECURSIVE {_dd_two_level_cells_cte()},
m AS (SELECT cells.vec_id, cells.cid, cells.ccos, e.embedding
      FROM cells JOIN e USING (vec_id)),
mp AS (SELECT x.cid, x.vec_id AS i, y.vec_id AS j,
              unnest(x.embedding) AS a, unnest(y.embedding) AS b
       FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id),
pdots AS (SELECT cid, i, j, SUM({fx(v='a')} * {fx(v='b')}) AS dot
          FROM mp GROUP BY 1, 2, 3),
dup AS (
  SELECT p.i, p.j
  FROM pdots p JOIN norms na ON na.vec_id = p.i
               JOIN norms nb ON nb.vec_id = p.j
  WHERE CAST(p.dot AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE))
        >= {_SEMDEDUP_THRESHOLD}
),
edges AS (SELECT i AS src, j AS dst FROM dup UNION SELECT j, i FROM dup),
reach(id, label) AS (
  SELECT vec_id, vec_id FROM e
  UNION
  SELECT g.dst, r.label FROM reach r JOIN edges g ON g.src = r.id
),
comp AS (SELECT id AS vec_id, MIN(label) AS component FROM reach GROUP BY id),
pick AS (
  SELECT vec_id, component, ROW_NUMBER() OVER (
    PARTITION BY component ORDER BY m.ccos ASC, vec_id ASC) AS prn
  FROM comp JOIN m USING (vec_id)
)
SELECT m.vec_id, m.cid AS cell, pick.component, (pick.prn = 1) AS keep
FROM m JOIN pick ON pick.vec_id = m.vec_id
"""


@query(
    "x_semdedup_diverse",
    _dd_semdedup_diverse_sql(),
    doc=(
        "SemDeDup with the paper's keep rule: threshold pairs within "
        "each cell form dup COMPONENTS (A~B~C chains collapse even "
        "when A!~C — min-label propagation, the x_dedup_clusters "
        "machinery; the oracle computes the same fixpoint with a "
        "recursive CTE), and each component keeps its member LEAST "
        "similar to the cell centroid (arXiv:2303.09540 §3: keeping "
        "low-centroid-similarity examples maximizes retained "
        "diversity). Tiebreak: lowest vec_id. Cell-bounded pair "
        "generation as in x_semdedup; the component loop runs "
        "O(within-cell dup-chain diameter) bounded join+agg rounds "
        "with checkpointed labels; the final keep is ONE row_number "
        "window per component. Assignment cosine reuses the same "
        "fixed-point dot, so the argmin compare is bit-identical "
        "across engines."
    ),
)
def x_semdedup_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..caching import track_persist
    from ..operators.components import connected_components

    emb, cells = _two_level_cells(spark, _emb(spark, sf_dir))
    m = track_persist(
        cells.join(emb, "vec_id")
        .select("vec_id", "cid", "ccos", "embedding")
        .withColumn("nn", fx_dot(F.col("embedding"), F.col("embedding")))
    )
    a = m.select(
        F.col("cid").alias("ca"), F.col("vec_id").alias("i"),
        F.col("embedding").alias("ea"), F.col("nn").alias("na"),
    )
    b = m.select(
        F.col("cid").alias("cb"), F.col("vec_id").alias("j"),
        F.col("embedding").alias("eb"), F.col("nn").alias("nb"),
    )
    pair_cos = fx_dot(F.col("eb"), F.col("ea")).cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    dup = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("i") < F.col("j")))
        .filter(pair_cos >= _SEMDEDUP_THRESHOLD)
        .select("i", "j")
    )
    comp = connected_components(
        dup, src="i", dst="j", nodes=m.select("vec_id")
    ).withColumnRenamed("id", "vec_id")
    prn = F.row_number().over(
        Window.partitionBy("component").orderBy(
            F.col("ccos").asc(), F.col("vec_id").asc()
        )
    )
    return (
        m.select("vec_id", "cid", "ccos")
        .join(comp, "vec_id")
        .withColumn("prn", prn)
        .select(
            "vec_id",
            F.col("cid").alias("cell"),
            "component",
            (F.col("prn") == 1).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# x_quality_classifier — hashed-feature linear model serving
# ---------------------------------------------------------------------------

_QCLF_BUCKETS = 4096
_QCLF_SCALE = 1 << 20


def _dd_qclf_sql() -> str:
    def md5l(expr: str) -> str:
        return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"

    return f"""
WITH model AS (
  SELECT b.bucket,
         ({md5l("'qw-' || CAST(b.bucket AS VARCHAR)")}
          % {2 * _QCLF_SCALE + 1}) - {_QCLF_SCALE} AS w
  FROM (SELECT unnest(range({_QCLF_BUCKETS})) AS bucket) b
),
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), ' +'),
                            x -> x <> '')) AS term
  FROM documents
),
feat AS (
  SELECT doc_id, {md5l('term')} % {_QCLF_BUCKETS} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2
)
SELECT f.doc_id,
       CAST(SUM(f.tf) AS BIGINT) AS n_feats,
       CAST(SUM(f.tf * m.w) AS BIGINT) AS margin_fp,
       (SUM(f.tf * m.w) >= 0) AS keep
FROM feat f JOIN model m USING (bucket)
GROUP BY f.doc_id
"""


@query(
    "x_quality_classifier",
    _dd_qclf_sql(),
    doc=(
        "Hashed-feature linear classifier serving — the fastText-style "
        "quality-filter shape CCNet/LLaMA-class pipelines run over "
        "every document: tokens hash into a FIXED bucket space "
        f"({_QCLF_BUCKETS} buckets, hashing trick), the weight vector "
        "is a bounded-by-construction table BROADCAST to every "
        "executor (the one join a model-scoring pass needs), and the "
        "margin is one map-side-combined integer aggregate per doc. "
        "Weights here derive deterministically from md5 so both "
        "engines materialize the identical model without a file "
        "artifact; swap in trained weights via the same bounded "
        "broadcast at deployment. Fixed-point integer margins hash "
        "across engines; sign gives the keep verdict."
    ),
)
def x_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import md5_long

    model = spark.range(_QCLF_BUCKETS).select(
        F.col("id").alias("bucket"),
        (
            md5_long(F.concat(F.lit("qw-"), F.col("id").cast("string")), 8)
            % F.lit(2 * _QCLF_SCALE + 1)
            - F.lit(_QCLF_SCALE)
        ).alias("w"),
    )
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.transform(ws_tokens("text"), F.lower)).alias("term")
    )
    feat = tok.groupBy(
        "doc_id", (md5_long(F.col("term"), 8) % _QCLF_BUCKETS).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    return (
        feat.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_feats"),
            F.sum(F.col("tf") * F.col("w")).cast("bigint").alias("margin_fp"),
            (F.sum(F.col("tf") * F.col("w")) >= 0).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# x_chunk_documents — context-window chunking with overlap
# ---------------------------------------------------------------------------

_CHUNK_W = 32   # window (tokens)
_CHUNK_S = 24   # stride => 8-token overlap

_XCHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), ' +'),
                             x -> x <> '') AS t
  FROM documents
),
meta AS (
  SELECT doc_id, t, len(t) AS n,
         1 + CASE WHEN len(t) > {_CHUNK_W}
                  THEN (len(t) - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S}
                  ELSE 0 END AS n_chunks
  FROM toks
),
chunks AS (
  SELECT doc_id, n,
         unnest(range(n_chunks)) AS chunk_idx
  FROM meta
)
SELECT c.doc_id,
       CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
       CAST(c.chunk_idx * {_CHUNK_S} AS BIGINT) AS start_tok,
       CAST(least({_CHUNK_W}, c.n - c.chunk_idx * {_CHUNK_S}) AS BIGINT) AS n_tok,
       md5(array_to_string(
         m.t[c.chunk_idx * {_CHUNK_S} + 1 :
             c.chunk_idx * {_CHUNK_S} + {_CHUNK_W}], ' ')) AS chunk_fp
FROM chunks c JOIN meta m USING (doc_id)
"""


@query(
    "x_chunk_documents",
    _XCHUNK_SQL,
    doc=(
        f"Context-window chunking (window {_CHUNK_W} tokens, stride "
        f"{_CHUNK_S} -> {_CHUNK_W - _CHUNK_S}-token overlap): every "
        "doc explodes into its training chunks — the RAG/pretraining "
        "fan-out op. Pure JVM: one tokenize, one sequence explode, one "
        "slice per chunk; no shuffle at all (narrow map+generate over "
        "the scan — chunks inherit the doc's partition, which is "
        "exactly what a 100 TB chunking pass wants). Chunk identity is "
        "an md5 fingerprint of the joined tokens, so downstream chunk-"
        "level dedup composes without carrying text twice."
    ),
)
def x_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.transform(ws_tokens("text"), F.lower).alias("t")
    ).withColumn("n", F.size("t"))
    n_chunks = F.lit(1) + F.when(
        F.col("n") > _CHUNK_W,
        F.expr(f"(n - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S}"),
    ).otherwise(F.lit(0))
    return (
        toks.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            (F.col("chunk_idx") * _CHUNK_S).cast("bigint").alias("start_tok"),
            F.least(
                F.lit(_CHUNK_W), F.col("n") - F.col("chunk_idx") * _CHUNK_S
            ).cast("bigint").alias("n_tok"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("t"), F.col("chunk_idx") * _CHUNK_S + 1, _CHUNK_W
                    ),
                )
            ).alias("chunk_fp"),
        )
    )


# ---------------------------------------------------------------------------
# x_temperature_mix — temperature-reweighted language mixture sampling
# ---------------------------------------------------------------------------

_TMIX_K = 200  # total sample budget
# temperature T = 1/2: sampling weight ~ p^(1/T) = p^2 — exact integer
# rationals (any rational 1/T works the same way; irrational powers
# would need libm pow and could never hash across engines)


def _dd_tmix_sql() -> str:
    return f"""
WITH cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1),
tot AS (SELECT CAST(SUM(c * c) AS BIGINT) AS s FROM cnt),
alloc0 AS (
  SELECT lang, c,
         ({_TMIX_K} * c * c) // tot.s AS base,
         ({_TMIX_K} * c * c) % tot.s AS rem
  FROM cnt, tot
),
deficit AS (SELECT {_TMIX_K} - CAST(SUM(base) AS BIGINT) AS d FROM alloc0),
alloc AS (
  SELECT lang, c,
         base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC)
                          <= deficit.d THEN 1 ELSE 0 END AS quota
  FROM alloc0, deficit
),
ranked AS (
  SELECT d.doc_id, d.lang,
         ROW_NUMBER() OVER (PARTITION BY d.lang
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC,
                                     d.doc_id ASC) AS rk
  FROM documents d
)
SELECT r.doc_id, r.lang, CAST(a.quota AS BIGINT) AS lang_quota
FROM ranked r JOIN alloc a USING (lang)
WHERE r.rk <= a.quota
"""


@query(
    "x_temperature_mix",
    _dd_tmix_sql(),
    doc=(
        "Temperature-reweighted mixture sampling (the multilingual "
        "rebalancing op every LLM data recipe runs — upweight tails, "
        f"T=1/2 here so weight ~ share^2): a {_TMIX_K}-doc budget is "
        "apportioned across languages by exact largest-remainder "
        "integer allocation (no floating point, no RNG), then each "
        "language takes its quota by deterministic md5 rank — the "
        "same RNG-free reservoir the sampling ops use. Language "
        "counts/quotas are one tiny agg (bounded: one row per "
        "language, broadcast); the per-language take is one "
        "WindowGroupLimit pass, no global sort. Rational temperatures "
        "p^(1/T) keep the arithmetic exact at any corpus size."
    ),
)
def x_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = cnt.agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s"))
    alloc0 = cnt.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.expr(f"({_TMIX_K} * c * c) div s").alias("base"),
        F.expr(f"({_TMIX_K} * c * c) % s").alias("rem"),
    )
    deficit = alloc0.agg(
        (F.lit(_TMIX_K) - F.sum("base")).cast("bigint").alias("d")
    )
    rn = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("lang").asc())
    )
    alloc = (
        alloc0.crossJoin(F.broadcast(deficit))
        .withColumn("rn", rn)
        .select(
            "lang",
            (
                F.col("base")
                + F.when(F.col("rn") <= F.col("d"), 1).otherwise(0)
            ).cast("bigint").alias("quota"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
        )
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rk", rk)
        .join(F.broadcast(alloc), "lang")
        .filter(F.col("rk") <= F.col("quota"))
        .select("doc_id", "lang", F.col("quota").alias("lang_quota"))
    )


# ---------------------------------------------------------------------------
# x_rank_fusion_rrf — hybrid retrieval: reciprocal-rank fusion of the
# BM25 ranking with a unigram-LM fluency ranking over the SAME
# candidate set
# ---------------------------------------------------------------------------

_RRF_K = 60       # the standard RRF smoothing constant
_RRF_TOPN = 20


def _dd_rrf_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), ' +'),
                            x -> x <> '')) AS term
  FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
corpus AS (SELECT CAST(SUM(dl) AS BIGINT) AS tl,
                  CAST(COUNT(*) AS BIGINT) AS n FROM dl),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok WHERE term IN ({terms}) GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
idf AS (SELECT term,
               CAST(({_BM25_SCALE} * (2 * corpus.n - 2 * df.df + 1))
                    // (2 * df.df + 1) AS BIGINT) AS idf_fp
        FROM df, corpus),
bm AS (
  SELECT tf.doc_id,
         CAST(SUM(
           (idf.idf_fp * (({_BM25_SCALE} * 44 * tf.tf * corpus.tl)
              // (20 * corpus.tl * tf.tf + 6 * corpus.tl + 18 * dl.dl * corpus.n)))
           // {_BM25_SCALE}
         ) AS BIGINT) AS bm_fp
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), corpus
  GROUP BY 1
),
atf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2),
vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM atf GROUP BY 1),
vtotal AS (SELECT CAST(SUM(cnt) AS BIGINT) AS vn FROM vocab),
p AS (SELECT term, CAST(({_BM25_SCALE} * cnt) // vtotal.vn AS BIGINT) AS p_fp
      FROM vocab, vtotal),
lm AS (
  SELECT a.doc_id,
         CAST(CAST(SUM(a.tf * p.p_fp) AS BIGINT)
              // CAST(SUM(a.tf) AS BIGINT) AS BIGINT) AS lm_fp
  FROM atf a JOIN p USING (term)
  WHERE a.doc_id IN (SELECT doc_id FROM bm)
  GROUP BY 1
),
ranked AS (
  SELECT bm.doc_id,
         ROW_NUMBER() OVER (ORDER BY bm.bm_fp DESC, bm.doc_id ASC) AS r_bm,
         ROW_NUMBER() OVER (ORDER BY lm.lm_fp DESC, bm.doc_id ASC) AS r_lm
  FROM bm JOIN lm USING (doc_id)
)
SELECT doc_id,
       CAST(r_bm AS BIGINT) AS r_bm,
       CAST(r_lm AS BIGINT) AS r_lm,
       CAST(({_BM25_SCALE} // ({_RRF_K} + r_bm))
            + ({_BM25_SCALE} // ({_RRF_K} + r_lm)) AS BIGINT) AS rrf_fp
FROM ranked
ORDER BY rrf_fp DESC, doc_id ASC
LIMIT {_RRF_TOPN}
"""


@query(
    "x_rank_fusion_rrf",
    _dd_rrf_sql(),
    doc=(
        "Hybrid retrieval via reciprocal-rank fusion (k=60): the BM25 "
        "lexical ranking and a unigram-LM fluency ranking are fused as "
        "sum(1/(k+rank)) in 2^20 fixed point (exact integer — RRF "
        "needs no score calibration, which is exactly why it is the "
        "standard hybrid fusion). BOTH rankings are computed only over "
        "the bounded candidate set (docs matching the query's terms — "
        "the inverted-index slice), so the rank windows sort "
        "|candidates| rows, never the corpus: the at-scale shape of "
        "every hybrid search stack (fuse per-query top-k lists, not "
        "global orderings). Corpus-wide LM statistics still shuffle on "
        "unbounded term keys with no broadcast hint."
    ),
)
def x_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..caching import track_persist

    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.transform(ws_tokens("text"), F.lower)).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.sum("dl").cast("bigint").alias("tl"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    tf = (
        tok.filter(F.col("term").isin(*_BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    idf = df.crossJoin(F.broadcast(corpus)).select(
        "term",
        F.expr(
            f"CAST(({_BM25_SCALE} * (2 * n - 2 * df + 1)) div (2 * df + 1) AS BIGINT)"
        ).alias("idf_fp"),
    )
    bm = track_persist(
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.expr(
                f"CAST((idf_fp * (({_BM25_SCALE} * 44 * tf * tl)"
                " div (20 * tl * tf + 6 * tl + 18 * dl * n)))"
                f" div {_BM25_SCALE} AS BIGINT)"
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("bigint").alias("bm_fp"))
    )
    atf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    vocab = atf.groupBy("term").agg(F.sum("tf").cast("bigint").alias("cnt"))
    vtotal = vocab.agg(F.sum("cnt").cast("bigint").alias("vn"))
    p = vocab.crossJoin(F.broadcast(vtotal)).select(
        "term", F.expr(f"CAST(({_BM25_SCALE} * cnt) div vn AS BIGINT)").alias("p_fp")
    )
    lm = (
        atf.join(bm.select("doc_id"), "doc_id", "left_semi")
        .join(p, "term")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(CAST(SUM(tf * p_fp) AS BIGINT)"
                " div CAST(SUM(tf) AS BIGINT) AS BIGINT)"
            ).alias("lm_fp")
        )
    )
    r_bm = F.row_number().over(
        Window.orderBy(F.col("bm_fp").desc(), F.col("doc_id").asc())
    )
    r_lm = F.row_number().over(
        Window.orderBy(F.col("lm_fp").desc(), F.col("doc_id").asc())
    )
    return (
        bm.join(lm, "doc_id")
        .withColumn("r_bm", r_bm.cast("bigint"))
        .withColumn("r_lm", r_lm.cast("bigint"))
        .select(
            "doc_id",
            "r_bm",
            "r_lm",
            F.expr(
                f"CAST(({_BM25_SCALE} div ({_RRF_K} + r_bm))"
                f" + ({_BM25_SCALE} div ({_RRF_K} + r_lm)) AS BIGINT)"
            ).alias("rrf_fp"),
        )
        .orderBy(F.col("rrf_fp").desc(), F.col("doc_id").asc())
        .limit(_RRF_TOPN)
    )


# ---------------------------------------------------------------------------
# a_structuring_screen — AML structuring (smurfing) detection: bursts
# of small payments that together cross a reporting threshold
# ---------------------------------------------------------------------------

_STRUCT_WINDOW_US = 24 * 3600 * 1_000_000
_STRUCT_SMALL_CENTS = 10_000   # each payment individually under $100
_STRUCT_MIN_N = 3              # at least 3 small payments in-window
_STRUCT_SUM_CENTS = 12_000     # summing to >= $120

_ASTRUCT_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
w AS (
  SELECT event_id, user_id, us, cents,
         CAST(COUNT(CASE WHEN cents < {_STRUCT_SMALL_CENTS} THEN 1 END)
              OVER fr AS BIGINT) AS n_small_24h,
         CAST(COALESCE(SUM(CASE WHEN cents < {_STRUCT_SMALL_CENTS} THEN cents END)
              OVER fr, 0) AS BIGINT) AS sum_small_cents_24h
  FROM e
  WINDOW fr AS (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN {_STRUCT_WINDOW_US} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, us, n_small_24h, sum_small_cents_24h
FROM w
WHERE n_small_24h >= {_STRUCT_MIN_N}
  AND sum_small_cents_24h >= {_STRUCT_SUM_CENTS}
"""


@query(
    "a_structuring_screen",
    _ASTRUCT_SQL,
    doc=(
        "AML structuring/smurfing screen (reference analog: the fraud "
        "marts its Gold layer feeds): per payer, a 24 h RANGE frame "
        "over event time counts sub-threshold payments and their "
        "running sum; a row triggers when >= 3 small payments total "
        ">= the report line. ONE window shuffle on user_id (the frame "
        "is integer-microsecond RANGE, so identical-timestamp peers "
        "aggregate identically in both engines — no ROWS-frame order "
        "ambiguity); amounts are exact integer cents. At scale this "
        "is the event-time-partitioned single-pass every velocity "
        "rule compiles to — no self-join, no state explosion, late "
        "data handled by the streaming twin's watermark "
        "(sliding_velocity)."
    ),
)
def a_structuring_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ._det import events_table

    e = (
        events_table(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts")).alias("us"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_STRUCT_WINDOW_US, 0)
    )
    small = F.when(F.col("cents") < _STRUCT_SMALL_CENTS, F.col("cents"))
    return (
        e.withColumn(
            "n_small_24h",
            F.count(F.when(F.col("cents") < _STRUCT_SMALL_CENTS, 1)).over(fr).cast("bigint"),
        )
        .withColumn(
            "sum_small_cents_24h",
            F.coalesce(F.sum(small).over(fr), F.lit(0)).cast("bigint"),
        )
        .filter(
            (F.col("n_small_24h") >= _STRUCT_MIN_N)
            & (F.col("sum_small_cents_24h") >= _STRUCT_SUM_CENTS)
        )
        .select("event_id", "user_id", "us", "n_small_24h", "sum_small_cents_24h")
    )


# ---------------------------------------------------------------------------
# x_source_reputation — source-level quality aggregation + verdict
# ---------------------------------------------------------------------------

_SREP_SCALE = 1 << 20
_SREP_MIN_MEAN = 450_000  # keep sources whose mean quality >= ~0.43


def _dd_srep_sql() -> str:
    toks = "list_filter(string_split_regex(trim(text), ' +'), x -> x <> '')"
    stop = (
        "len(list_filter(list_transform({t}, x -> lower(x)),"
        " x -> list_contains({sl}, x)))"
    )
    from .llmdata import _DD_STOPLIST

    nstop = stop.format(t=toks, sl=_DD_STOPLIST)
    return f"""
WITH q AS (
  SELECT source,
         CAST(({_SREP_SCALE} * {nstop}) // (2 * len({toks})) AS BIGINT)
         + CAST(({_SREP_SCALE} * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                // (2 * length(text)) AS BIGINT) AS q_fp
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(q_fp) // COUNT(*) AS BIGINT) AS mean_q_fp,
       (SUM(q_fp) // COUNT(*) >= {_SREP_MIN_MEAN}) AS keep_source
FROM q GROUP BY source
"""


@query(
    "x_source_reputation",
    _dd_srep_sql(),
    doc=(
        "Source-level reputation gate (the RefinedWeb/CCNet domain-"
        "blocklist shape, learned from the corpus instead of curated): "
        "per-doc fixed-point quality (stopword + alpha ratios — the "
        "same 2^20 integer signal the stratified trim uses) aggregates "
        "to a per-source mean in ONE map-side-combined hash agg; the "
        "verdict is a pure integer compare. One shuffle on source; at "
        "100 TB the source cardinality (~domains) is millions of rows "
        "— still a trivial aggregate, and the keep set then broadcasts "
        "back as a join filter over the corpus."
    ),
)
def x_source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import stopword_hits, ws_tokens as _wst

    d = read_table(spark, sf_dir, "documents")
    q_fp = (
        F.expr(f"CAST(({_SREP_SCALE} * n_stop) div (2 * n_tok) AS BIGINT)")
        + F.expr(
            f"CAST(({_SREP_SCALE} * n_alpha) div (2 * n_chars) AS BIGINT)"
        )
    )
    q = d.select(
        "source",
        stopword_hits("text").alias("n_stop"),
        F.size(_wst("text")).alias("n_tok"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.length("text").alias("n_chars"),
    ).select("source", q_fp.alias("q_fp"))
    return q.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("CAST(SUM(q_fp) div COUNT(*) AS BIGINT)").alias("mean_q_fp"),
        F.expr(f"SUM(q_fp) div COUNT(*) >= {_SREP_MIN_MEAN}").alias("keep_source"),
    )


# ---------------------------------------------------------------------------
# x_embedding_outliers — norm-percentile embedding hygiene
# ---------------------------------------------------------------------------

_EOUT_LO_PCT = 5    # flag below p5 or above p95 of squared-norm
_EOUT_HI_PCT = 95


def _dd_eout_sql() -> str:
    fx = _FXQ.format
    return f"""
WITH norms AS (
  SELECT vec_id, SUM({fx(v='v')} * {fx(v='v')}) AS nn
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY 1
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM norms),
ranked AS (
  SELECT vec_id, nn,
         ROW_NUMBER() OVER (ORDER BY nn ASC, vec_id ASC) AS rk
  FROM norms
)
SELECT r.vec_id, CAST(r.nn AS BIGINT) AS norm_sq_fp,
       (r.rk * 100 <= {_EOUT_LO_PCT} * n.cnt
        OR r.rk * 100 > {_EOUT_HI_PCT} * n.cnt) AS is_outlier
FROM ranked r, n
"""


@query(
    "x_embedding_outliers",
    _dd_eout_sql(),
    doc=(
        "Embedding hygiene: flag vectors whose exact integer squared "
        "norm falls in the tail percentiles (degenerate/corrupt "
        "embeddings — the standard pre-index filter). Discrete integer "
        "rank percentiles (rank*100 <= p*count) — no float percentile "
        "interpolation to disagree across engines. EXACT global ranks "
        "are computed DISTRIBUTED, never via one global sort window: "
        "rank = (cumulative count of coarser norm-buckets, a cumsum "
        "over the bounded bucket table, broadcast back) + (row_number "
        "within the row's bucket, an ordinary partitioned window). "
        "The only global ordering touches ~2^14 bucket rows regardless "
        "of corpus size — the two-level shape every exact distributed "
        "selection uses."
    ),
)
def x_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    norms = emb.select(
        "vec_id", fx_dot(F.col("embedding"), F.col("embedding")).alias("nn")
    ).withColumn("b", F.expr("nn div 4294967296"))  # 2^32 → ≤ ~2^14 buckets
    bstats = norms.groupBy("b").agg(F.count(F.lit(1)).alias("bc"))
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    cum = bstats.withColumn(
        "cum_prev", F.coalesce(F.sum("bc").over(wcum), F.lit(0))
    ).select("b", "cum_prev")
    n = norms.agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    rk_in = F.row_number().over(
        Window.partitionBy("b").orderBy(F.col("nn").asc(), F.col("vec_id").asc())
    )
    return (
        norms.withColumn("rk_in", rk_in)
        .join(F.broadcast(cum), "b")
        .crossJoin(F.broadcast(n))
        .withColumn("rk", F.col("cum_prev") + F.col("rk_in"))
        .select(
            "vec_id",
            F.col("nn").cast("bigint").alias("norm_sq_fp"),
            (
                (F.col("rk") * 100 <= _EOUT_LO_PCT * F.col("cnt"))
                | (F.col("rk") * 100 > _EOUT_HI_PCT * F.col("cnt"))
            ).alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# x_kcore — k-core of the near-dup graph (dense-cluster extraction)
# ---------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 10  # must match k_core(max_iter=...) — Spark raises if
                    # the graph needs more, so the unrolled oracle can
                    # never silently diverge


def _dd_kcore_sql() -> str:
    from .round5 import _dd_neardup_pairs_cte

    # every round CTE is MATERIALIZED: DuckDB inlines plain CTEs, and a
    # 10-round chain referencing its predecessor 3x per round would
    # otherwise expand the pairs subtree 3^10 times (observed as an
    # open-file explosion on the parquet scan)
    rounds = []
    prev = "e0"
    for i in range(1, _KCORE_ROUNDS + 1):
        rounds.append(
            f"""w{i} AS MATERIALIZED (
  SELECT a FROM (SELECT a, COUNT(*) AS c FROM {prev} GROUP BY a) WHERE c < {_KCORE_K}),
e{i} AS MATERIALIZED (SELECT e.a, e.b FROM {prev} e
         WHERE e.a NOT IN (SELECT a FROM w{i})
           AND e.b NOT IN (SELECT a FROM w{i}))"""
        )
        prev = f"e{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH {_dd_neardup_pairs_cte()},
e0 AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
       UNION SELECT id_b, id_a FROM pairs),
{chain}
SELECT a AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM {prev} GROUP BY a
"""


@query(
    "x_kcore",
    _dd_kcore_sql(),
    doc=(
        f"{_KCORE_K}-core of the LSH near-dup graph: iteratively peel "
        "vertices of insufficient degree until the dense residue "
        "remains — the standard dense-cluster / fraud-ring extraction "
        "(boilerplate farms and template spam form exactly these "
        "cores in web corpora). Shares the banded-minhash pairs "
        "subtree with pagerank/triangles. Per round: ONE degree hash "
        "agg + two anti joins, labels localCheckpoint'd — rounds = "
        "peeling depth, and the operator RAISES past "
        f"{_KCORE_ROUNDS} rounds so the {_KCORE_ROUNDS}-round "
        "unrolled-CTE oracle can never silently diverge from a "
        "non-converged run."
    ),
)
def x_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import k_core
    from .llmdata import _docs, neardup_candidate_pairs

    d = _docs(spark, sf_dir)
    pairs = neardup_candidate_pairs(d)
    return (
        k_core(pairs, _KCORE_K, src="id_a", dst="id_b", max_iter=_KCORE_ROUNDS)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", "core_degree")
    )


# ---------------------------------------------------------------------------
# x_bpe_merges — byte-pair-encoding merge induction (tokenizer training)
# ---------------------------------------------------------------------------

_BPE_MERGES = 3


def _dd_bpe_chain() -> str:
    """WITH-chain body: corpus token frequencies + `_BPE_MERGES` rounds
    of pair-count / pick-merge / apply-merge, ending at s{_BPE_MERGES}
    (the distinct-token table tokenized by the induced merges). Shared
    by the merge-induction oracle and the apply oracle (round6c)."""
    toks = "list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x <> '')"
    rounds = []
    prev = "s0"
    for i in range(1, _BPE_MERGES + 1):
        rounds.append(f"""
pc{i} AS MATERIALIZED (
  SELECT p AS pair, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT freq, unnest(list_transform(range(1, len(sy)),
                 j -> sy[j] || '  ' || sy[j + 1])) AS p
    FROM (SELECT freq, string_split({prev}.seq, '  ') AS sy FROM {prev})
    WHERE len(sy) >= 2
  ) GROUP BY p
),
m{i} AS MATERIALIZED (
  SELECT pair, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS rn
  FROM pc{i} QUALIFY rn = 1
),
s{i} AS MATERIALIZED (
  SELECT token, freq,
         trim(replace(' ' || {prev}.seq || ' ',
                      ' ' || m{i}.pair || ' ',
                      ' ' || replace(m{i}.pair, '  ', '') || ' ')) AS seq
  FROM {prev}, m{i}
)""")
        prev = f"s{i}"
    chain = ",".join(rounds)
    return f"""tok AS (SELECT unnest({toks}) AS token FROM documents),
tf AS MATERIALIZED (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
                    FROM tok GROUP BY token),
s0 AS MATERIALIZED (
  SELECT token, freq,
         array_to_string(list_transform(range(1, length(token) + 1),
                         i -> substr(token, i, 1)), '  ') AS seq
  FROM tf
),{chain}"""


def _dd_bpe_sql() -> str:
    merges = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, replace(pair, '  ', ' ') AS merged_pair,"
        f" cnt AS pair_count FROM m{i}"
        for i in range(1, _BPE_MERGES + 1)
    )
    return f"""
WITH {_dd_bpe_chain()}
SELECT CAST(merge_rank AS BIGINT) AS merge_rank, merged_pair, pair_count
FROM ({merges})
ORDER BY merge_rank
"""


@query(
    "x_bpe_merges",
    _dd_bpe_sql(),
    doc=(
        f"BPE merge induction (first {_BPE_MERGES} merges of tokenizer "
        "training, Sennrich et al. 2016): token sequences start as "
        "characters; each round counts adjacent symbol pairs weighted "
        "by token frequency, picks the most frequent (deterministic "
        "count-then-lexicographic tiebreak), and applies the merge "
        "with an anchored literal replace (space-padded, leftmost "
        "non-overlapping in both engines). Everything runs on the "
        "DISTINCT-token table weighted by tf — the exact-duplicate "
        "contraction again: corpus size only enters through the one "
        "token-frequency aggregate, so a 100 TB corpus trains from a "
        "vocab-sized table. Each round is one explode+agg and one "
        "broadcast of a single merge row; at real merge counts (30k+) "
        "the loop runs driver-side with the same per-round plan."
    ),
)
def x_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _ = _bpe_train(spark, sf_dir)
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.orderBy("merge_rank")


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Run `_BPE_MERGES` induction rounds; return (per-round best-merge
    single-row frames, final distinct-token seqs frame). Shared by
    merge induction and corpus tokenization (round6c x_bpe_apply)."""
    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.transform(ws_tokens("text"), F.lower)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    # symbols separated by TWO spaces: the anchored single-space-padded
    # replace pattern then never overlaps a neighbouring occurrence
    # (each match consumes one space of each flanking separator), so
    # leftmost non-overlapping replace — identical in both engines —
    # applies the merge to EVERY occurrence, exactly like the canonical
    # greedy left-to-right BPE pass
    seqs = tf.select(
        "token",
        "freq",
        F.concat_ws(
            "  ",
            F.expr("transform(sequence(1, length(token)), i -> substr(token, i, 1))"),
        ).alias("seq"),
    )
    out = []
    for rank in range(1, _BPE_MERGES + 1):
        sy = F.split(F.col("seq"), "  ")
        pairs = (
            seqs.select("freq", sy.alias("sy"))
            .filter(F.size("sy") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(sy) - 2),"
                        " j -> concat(sy[j], '  ', sy[j + 1]))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(1)
        out.append(
            best.select(
                F.lit(rank).cast("bigint").alias("merge_rank"),
                F.replace(F.col("pair"), F.lit("  "), F.lit(" ")).alias(
                    "merged_pair"
                ),
                F.col("cnt").alias("pair_count"),
            )
        )
        merged = F.replace(F.col("pair"), F.lit("  "), F.lit(""))
        seqs = (
            seqs.crossJoin(F.broadcast(best))
            .select(
                "token",
                "freq",
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                        F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                        F.concat(F.lit(" "), merged, F.lit(" ")),
                    )
                ).alias("seq"),
            )
        )
        from ..caching import track_persist

        seqs = track_persist(seqs)
    return out, seqs


# ---------------------------------------------------------------------------
# t_freshness_skew — cross-table staleness probe
# ---------------------------------------------------------------------------

_TFRESH_SQL = """
WITH hw AS (
  SELECT 'orders' AS tbl, epoch_us(CAST(MAX(o_orderdate) AS TIMESTAMP)) AS max_us
  FROM orders
  UNION ALL
  SELECT 'lineitem', epoch_us(CAST(MAX(l_shipdate) AS TIMESTAMP)) FROM lineitem
  UNION ALL
  SELECT 'events', MAX(epoch_us(ts)) FROM events
),
ref AS (SELECT MAX(max_us) AS ref_us FROM hw)
SELECT hw.tbl,
       CAST(hw.max_us AS BIGINT) AS high_water_us,
       CAST(ref.ref_us - hw.max_us AS BIGINT) AS staleness_us
FROM hw, ref
"""


@query(
    "t_freshness_skew",
    _TFRESH_SQL,
    doc=(
        "Pipeline freshness probe (the dbt source-freshness check the "
        "reference README promises, made deterministic): each table's "
        "event-time high-water mark vs the freshest table — staleness "
        "as exact integer microseconds, no wall clock anywhere (a "
        "wall-clock 'now' could never hash across engines or reruns). "
        "Three MAX aggregates read parquet footer stats where "
        "available; the union is 3 rows; zero shuffles beyond the "
        "scalar aggs. The CDC twin is a3_high_water_mark per entity; "
        "this is the cross-SOURCE lag view an operator pages on."
    ),
)
def t_freshness_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._det import events_table

    o = read_table(spark, sf_dir, "orders").agg(
        F.unix_micros(F.max("o_orderdate").cast("timestamp")).alias("max_us")
    ).select(F.lit("orders").alias("tbl"), "max_us")
    li = read_table(spark, sf_dir, "lineitem").agg(
        F.unix_micros(F.max("l_shipdate").cast("timestamp")).alias("max_us")
    ).select(F.lit("lineitem").alias("tbl"), "max_us")
    ev = events_table(spark, sf_dir).agg(
        F.max(F.unix_micros("ts")).alias("max_us")
    ).select(F.lit("events").alias("tbl"), "max_us")
    hw = o.unionByName(li).unionByName(ev)
    ref = hw.agg(F.max("max_us").alias("ref_us"))
    return hw.crossJoin(F.broadcast(ref)).select(
        "tbl",
        F.col("max_us").cast("bigint").alias("high_water_us"),
        (F.col("ref_us") - F.col("max_us")).cast("bigint").alias("staleness_us"),
    )
