"""Round-5 operator additions.

Three classic multi-join/semi-join analytics shapes (q03/q04/q06 — the
reference's Gold-mart join patterns at TPC-H scale, `fact_transactions.sql`
/ `dim_customers.sql` analogs), plus depth in the LLM-data and CDC
surfaces: fraud-ring triangle counting over the near-dup graph, asymmetric
shingle containment, kNN label classification, int8 scalar-quantized ANN,
deterministic stratified reservoir sampling, a corpus-derived unigram
likelihood score, and batch late-arrival (out-of-order CDC) detection.

Determinism follows queries/_det.py: exact decimal money sums, integer
fixed-point for anything iterative/fractional, and single-division doubles
written with the same IEEE op order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.similarity import (
    MINHASH_PERMS,
    cosine_against,
    exploded_shingles,
)
from ..functions.text import ws_tokens
from ..sources.parquet_io import read_table
from ._det import dec, dsum_r2, events_table, sql_dec, sql_dsum_r2
from .llmdata import _CLUST_MATCH_MIN, _dd_minhash_cte
from .registry import query

# ---------------------------------------------------------------------------
# q03 — shipping priority (TPC-H Q3 shape): dim-filter → two joins →
# group → top-k. The reference's "open revenue by order" Gold pattern.
# ---------------------------------------------------------------------------

_Q03_CUT = "1998-06-01 00:00:00"

_Q03_SQL = f"""
SELECT
  l.l_orderkey,
  {sql_dsum_r2(f"{sql_dec('l.l_extendedprice', 12, 2)} * (CAST(1 AS DECIMAL(4,2)) - {sql_dec('l.l_discount', 4, 2)})", "revenue")},
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q03_CUT}'
  AND l.l_shipdate > TIMESTAMP '{_Q03_CUT}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
"""


@query(
    "q03_shipping_priority",
    _Q03_SQL,
    bench=True,
    doc=(
        "TPC-H Q3 shape (J1+J2 composed): segment-filtered customer dim "
        "broadcasts into orders, orders⋈lineitem shuffles on the order "
        "key (the natural 100 TB co-partitioning; bucketed tables make "
        "it exchange-free), exact-decimal revenue, TakeOrdered top-10 — "
        "no global sort."
    ),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit(_Q03_CUT).cast("timestamp")
    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    one = F.lit(1).cast("decimal(4,2)")
    rev = dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 4, 2))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_r2(rev, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — order priority via EXISTS (left-semi join with a non-equi term)
# ---------------------------------------------------------------------------

_Q04_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
"""


@query(
    "q04_order_priority",
    _Q04_SQL,
    doc=(
        "TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join on the "
        "order key with the late-ship range term evaluated inside the "
        "join — one shuffle on the natural key, then a tiny hash agg. "
        "The semi join never materializes lineitem columns."
    ),
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# q06 — revenue forecast (TPC-H Q6 shape): the pure pushdown showcase
# ---------------------------------------------------------------------------

_Q06_SQL = f"""
SELECT {sql_dsum_r2(f"{sql_dec('l_extendedprice', 12, 2)} * {sql_dec('l_discount', 4, 2)}", "revenue")},
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < CAST(24 AS DOUBLE)
"""


@query(
    "q06_revenue_forecast",
    _Q06_SQL,
    doc=(
        "TPC-H Q6 shape: every predicate reaches the parquet scan "
        "(PushedFilters on shipdate/discount/quantity), two columns "
        "read, single map-side-combined global agg — the minimal-IO "
        "plan at any scale."
    ),
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= F.lit(0.05))
        & (F.col("l_discount") <= F.lit(0.07))
        & (F.col("l_quantity") < F.lit(24.0))
    )
    return filtered.agg(
        dsum_r2(dec("l_extendedprice", 12, 2) * dec("l_discount", 4, 2), "revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# x_triangle_count — fraud-ring / dense-cluster detection: per-node
# triangle membership over the LSH near-dup graph
# ---------------------------------------------------------------------------


def _dd_neardup_pairs_cte() -> str:
    """WITH-clause prefix producing the `pairs(id_a, id_b)` near-dup
    candidate edges (id_a < id_b) — the same banded-minhash graph the
    clustering/pagerank oracles use."""
    bands, r = 4, MINHASH_PERMS // 4
    band_defs = ",\n  ".join(
        "("
        + " || '-' || ".join(f"CAST(sig_{b * r + i} AS VARCHAR)" for i in range(r))
        + f") AS band_{b}"
        for b in range(bands)
    )
    or_cond = " OR ".join(f"a.band_{b} = b.band_{b}" for b in range(bands))
    match_sum = " + ".join(
        f"(CASE WHEN a.sig_{j} = b.sig_{j} THEN 1 ELSE 0 END)"
        for j in range(MINHASH_PERMS)
    )
    return f"""{_dd_minhash_cte()},
banded AS (SELECT doc_id, {", ".join(f"sig_{j}" for j in range(MINHASH_PERMS))},
  {band_defs}
FROM sig),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({or_cond})
  WHERE {match_sum} >= {_CLUST_MATCH_MIN}
)"""


_XTRI_SQL = f"""
WITH {_dd_neardup_pairs_cte()},
tri AS (
  SELECT p1.id_a AS a, p1.id_b AS b, p2.id_b AS c
  FROM pairs p1
  JOIN pairs p2 ON p2.id_a = p1.id_b
  JOIN pairs p3 ON p3.id_a = p1.id_a AND p3.id_b = p2.id_b
),
verts AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM verts GROUP BY doc_id
"""


@query(
    "x_triangle_count",
    _XTRI_SQL,
    doc=(
        "Per-node triangle membership over the near-dup graph (fraud-"
        "ring / dense-duplicate-cluster signal). Edges are re-oriented "
        "low-degree→high-degree before the two wedge joins (the "
        "power-law skew hedge: post-orientation out-degree is "
        "O(sqrt(m)), so hubs never anchor the join) and each triangle "
        "still enumerates exactly once under the acyclic (deg, id) "
        "order. Membership counts are orientation-independent, so the "
        "id-ordered oracle matches. No driver-side graph state."
    ),
)
def x_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import triangle_counts
    from .llmdata import neardup_candidate_pairs

    d = read_table(spark, sf_dir, "documents")
    pairs = neardup_candidate_pairs(d)

    return triangle_counts(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), "n_triangles"
    )


# ---------------------------------------------------------------------------
# x_containment_pairs — asymmetric near-dup: |A∩B| / |A| catches
# subset/superset duplication that symmetric Jaccard under-scores
# ---------------------------------------------------------------------------

_XCONT_K = 5
_XCONT_T = 0.5

_XCONT_SQL = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split_regex(trim(text), ' +'), x -> x <> '') AS toks FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
         generate_series(1, greatest(len(toks) - {_XCONT_K - 1}, 1)),
         i -> array_to_string(toks[i:i+{_XCONT_K - 1}], ' ')))) AS shingle FROM toks),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common,
       CAST(n_common AS DOUBLE) / sa.n AS cont_a,
       CAST(n_common AS DOUBLE) / sb.n AS cont_b
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_common AS DOUBLE) / sa.n >= {_XCONT_T}
   OR CAST(n_common AS DOUBLE) / sb.n >= {_XCONT_T}
"""


@query(
    "x_containment_pairs",
    _XCONT_SQL,
    doc=(
        "Asymmetric shingle containment (|A∩B|/|A|): flags sub/superset "
        "duplication (quotes, boilerplate wrapping) that Jaccard "
        "under-scores. Same inverted-index join as the Jaccard baseline "
        "— one shuffle on shingle, one on the pair key; containments "
        "are exact-integer ratios surfaced by a single double division."
    ),
)
def x_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    sh = exploded_shingles(d, "doc_id", "text", k=_XCONT_K)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    cont_a = F.col("n_common").cast("double") / F.col("n_a")
    cont_b = F.col("n_common").cast("double") / F.col("n_b")
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("cont_a", cont_a)
        .withColumn("cont_b", cont_b)
        .filter((F.col("cont_a") >= _XCONT_T) | (F.col("cont_b") >= _XCONT_T))
        .select("id_a", "id_b", "n_common", "cont_a", "cont_b")
    )


# ---------------------------------------------------------------------------
# x_knn_classify — kNN majority-vote labeling (auto-labeling /
# label-propagation primitive for training-data curation)
# ---------------------------------------------------------------------------

_KNN_QUERIES = 5  # vec_id 0..4 are the query points
_KNN_K = 10

_XKNN_SQL = f"""
WITH fx AS (
  SELECT vec_id, label, unnest(embedding) AS x, unnest(generate_series(1, 64)) AS i
  FROM embeddings
),
fxq AS (SELECT vec_id, label, i, CAST(FLOOR(CAST(x AS DOUBLE) * 1048576) AS BIGINT) AS v FROM fx),
norms AS (SELECT vec_id, SUM(v * v) AS nrm FROM fxq GROUP BY vec_id),
dots AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, ANY_VALUE(c.label) AS label, SUM(c.v * q.v) AS dot
  FROM fxq c JOIN fxq q ON q.i = c.i
  WHERE q.vec_id < {_KNN_QUERIES} AND c.vec_id >= {_KNN_QUERIES}
  GROUP BY 1, 2
),
scored AS (
  SELECT qid, cid, label,
         CAST(dot AS DOUBLE) / sqrt(CAST(nc.nrm AS DOUBLE) * CAST(nq.nrm AS DOUBLE)) AS cosine
  FROM dots JOIN norms nc ON nc.vec_id = cid JOIN norms nq ON nq.vec_id = qid
),
topk AS (
  SELECT qid, label FROM (
    SELECT qid, label, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rn
    FROM scored
  ) WHERE rn <= {_KNN_K}
),
votes AS (SELECT qid, label, CAST(COUNT(*) AS BIGINT) AS votes FROM topk GROUP BY qid, label)
SELECT qid, label AS pred_label, votes FROM (
  SELECT qid, label, votes,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, label ASC) AS rn
  FROM votes
) WHERE rn = 1
"""


@query(
    "x_knn_classify",
    _XKNN_SQL,
    doc=(
        "kNN majority-vote classification: 5 query vectors broadcast "
        "against the corpus, per-query top-10 by fixed-point cosine, "
        "majority label with deterministic (votes DESC, label ASC) "
        "tiebreak. The corpus scan is one narrow pass; at 100 TB the "
        "query side is always the broadcast side and the top-k is a "
        "per-partition heap (WindowGroupLimit), never a global sort."
    ),
)
def x_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= _KNN_QUERIES)
    scored = corpus.crossJoin(F.broadcast(qdf)).select(
        "qid",
        F.col("vec_id").alias("cid"),
        "label",
        cosine_against(F.col("qv"), F.col("embedding")).alias("cosine"),
    )
    w_rank = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    topk = scored.withColumn("rn", F.row_number().over(w_rank)).filter(
        F.col("rn") <= _KNN_K
    )
    votes = topk.groupBy("qid", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("votes")
    )
    w_vote = Window.partitionBy("qid").orderBy(F.col("votes").desc(), F.col("label").asc())
    return (
        votes.withColumn("rn", F.row_number().over(w_vote))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("label").alias("pred_label"), "votes")
    )


# ---------------------------------------------------------------------------
# x_ann_sq8 — int8 scalar-quantized ANN: per-dim [min,max] from the
# corpus → uint8 codes → integer L2 distance (4× memory cut vs float32,
# the standard first compression rung below PQ)
# ---------------------------------------------------------------------------

_SQ8_Q = (
    "CASE WHEN {mx} = {mn} THEN CAST(0 AS BIGINT) "
    "ELSE LEAST(CAST(255 AS BIGINT), GREATEST(CAST(0 AS BIGINT), "
    "CAST(FLOOR(((CAST({x} AS DOUBLE) - {mn}) * CAST(255 AS DOUBLE)) / ({mx} - {mn})) AS BIGINT)))"
    " END"
)

_XSQ8_SQL = f"""
WITH dims AS (
  SELECT vec_id, unnest(embedding) AS x, unnest(generate_series(1, 64)) AS i
  FROM embeddings
),
stats AS (
  SELECT i, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
  FROM dims WHERE vec_id <> 0 GROUP BY i
),
codes AS (
  SELECT d.vec_id, d.i,
         {_SQ8_Q.format(x="d.x", mn="s.mn", mx="s.mx")} AS qv
  FROM dims d JOIN stats s USING (i)
),
dist AS (
  SELECT c.vec_id, SUM((c.qv - qq.qv) * (c.qv - qq.qv)) AS d2
  FROM codes c JOIN codes qq ON qq.vec_id = 0 AND qq.i = c.i
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id
)
SELECT vec_id, CAST(d2 AS BIGINT) AS d2
FROM dist ORDER BY d2 ASC, vec_id ASC LIMIT 10
"""

_SQ8_SPARK_Q = (
    "zip_with(embedding, sequence(0, 63), (x, i) -> "
    "CASE WHEN mx[i] = mn[i] THEN CAST(0 AS BIGINT) "
    "ELSE LEAST(CAST(255 AS BIGINT), GREATEST(CAST(0 AS BIGINT), "
    "CAST(FLOOR(((CAST(x AS DOUBLE) - mn[i]) * CAST(255 AS DOUBLE)) / (mx[i] - mn[i])) AS BIGINT)))"
    " END)"
)


@query(
    "x_ann_sq8",
    _XSQ8_SQL,
    bench=True,
    doc=(
        "Scalar-quantized (SQ8) ANN: per-dimension [min,max] learned "
        "from the corpus in ONE wide agg (128 map-side-combined "
        "min/max), codes computed in a narrow pass with the stats row "
        "broadcast, integer L2 over uint8 codes, TakeOrdered top-10. "
        "The quantization double math is written with identical IEEE "
        "op order in both engines; everything after it is exact "
        "integers. At 100 TB codes are 4× smaller than float32 "
        "vectors and the distance loop is pure JVM codegen."
    ),
)
def x_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") != 0)
    stats = corpus.agg(
        F.array(
            *[F.min(F.col("embedding")[i].cast("double")) for i in range(64)]
        ).alias("mn"),
        F.array(
            *[F.max(F.col("embedding")[i].cast("double")) for i in range(64)]
        ).alias("mx"),
    )
    from ..caching import track_persist

    # codes are one short array per vector and feed 2+ downstream
    # consumers (query row, corpus scan, rescore pool) — persist so the
    # 128-agg stats pass and quantization run ONCE, not per consumer
    coded = track_persist(
        emb.crossJoin(F.broadcast(stats)).select(
            "vec_id", F.expr(_SQ8_SPARK_Q).alias("qv")
        )
    )
    qq = coded.filter(F.col("vec_id") == 0).select(F.col("qv").alias("qqv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("qqv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        coded.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qq))
        .select("vec_id", d2.cast("bigint").alias("d2"))
        .orderBy(F.col("d2").asc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# x_reservoir_sample — deterministic stratified reservoir: fixed-size
# uniform sample per stratum via md5 ranking (reproducible across runs
# and engines, no RNG state)
# ---------------------------------------------------------------------------

_RSV_K = 5

_XRSV_SQL = f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
  FROM documents
) WHERE rk <= {_RSV_K}
"""


@query(
    "x_reservoir_sample",
    _XRSV_SQL,
    doc=(
        "Stratified fixed-size-per-stratum sample: rank by "
        "md5(doc_id) within each source, keep k — a deterministic "
        "reservoir (same sample every run/engine, no RNG state to "
        "coordinate across executors). One shuffle on the stratum key; "
        "WindowGroupLimit caps each partition at k before the exchange."
    ),
)
def x_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _RSV_K)
        .select("doc_id", "source", F.col("rk").cast("bigint").alias("rk"))
    )


# ---------------------------------------------------------------------------
# x_unigram_likelihood — corpus-derived unigram LM score per doc
# (fluency/quality signal beyond the heuristic feature score), in
# integer fixed point so it hashes across engines
# ---------------------------------------------------------------------------

_ULM_SCALE = 1 << 20

_XULM_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_transform(
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> ''),
    x -> lower(x))) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term),
vocab AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY term),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab),
p AS (SELECT term, CAST(({_ULM_SCALE} * cnt) // total.n AS BIGINT) AS p_fp FROM vocab, total)
SELECT t.doc_id,
       CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
       CAST(CAST(SUM(t.tf * p.p_fp) AS BIGINT) // CAST(SUM(t.tf) AS BIGINT) AS BIGINT) AS score_fp
FROM tf t JOIN p ON p.term = t.term
GROUP BY t.doc_id
"""


@query(
    "x_unigram_likelihood",
    _XULM_SQL,
    doc=(
        "Unigram-LM doc score: token probabilities learned from the "
        "corpus itself (2^20 fixed point — libm log/float would never "
        "hash across engines), mean per-token likelihood per doc. "
        "tf→vocab are two map-side-combined aggs; the tf⋈vocab join "
        "shuffles on term with NO broadcast hint (the vocabulary is "
        "unbounded — the x_top_terms lesson); the corpus-total is the "
        "only scalar crossJoin."
    ),
)
def x_unigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.transform(ws_tokens("text"), F.lower)).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    p = vocab.crossJoin(F.broadcast(total)).select(
        "term", F.expr(f"CAST(({_ULM_SCALE} * cnt) div n AS BIGINT)").alias("p_fp")
    )
    return (
        tf.join(p, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.expr("CAST(SUM(tf * p_fp) div SUM(tf) AS BIGINT)").alias("score_fp"),
        )
    )


# ---------------------------------------------------------------------------
# c7_late_events — batch late-arrival detection: the CDC out-of-order
# audit (what the streaming watermark drops, quantified per key)
# ---------------------------------------------------------------------------

_C7_LATE_US = 300_000_000  # 5 min, in microseconds

_C7_SQL = f"""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN lag_us > {_C7_LATE_US} THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(CASE WHEN lag_us > {_C7_LATE_US} THEN lag_us END), 0) AS BIGINT)
         AS max_late_us
FROM (
  SELECT user_id,
         epoch_us(MAX(ts) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
           - epoch_us(ts) AS lag_us
  FROM events
)
GROUP BY user_id
"""


@query(
    "c7_late_events",
    _C7_SQL,
    doc=(
        "Late-arrival audit: per-key high-watermark (running max event "
        "time in arrival order = the batch twin of the streaming "
        "watermark) vs each event's timestamp; counts events later "
        "than the 5-min tolerance and the worst lag. One window + one "
        "agg, both partitioned on the key — no global ordering. "
        "Microsecond integer arithmetic (second-granularity datediffs "
        "disagree across engines on sub-second components)."
    ),
)
def c7_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    lag_us = F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts"))
    late = F.col("lag_us") > F.lit(_C7_LATE_US)
    return (
        ev.withColumn("lag_us", lag_us)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("bigint").alias("n_late"),
            F.coalesce(F.max(F.when(late, F.col("lag_us"))), F.lit(0))
            .cast("bigint")
            .alias("max_late_us"),
        )
    )


# ---------------------------------------------------------------------------
# x_simhash_dedup_pairs — simhash near-dup pairs via pigeonhole banding:
# hamming(a,b) <= 1 means the two 16-bit halves can't BOTH differ, so a
# bucket join on either half finds every qualifying pair without the
# all-pairs product
# ---------------------------------------------------------------------------

_SIMHAM_MAX = 1  # pigeonhole: 2 bands cover hamming <= 1

_XSIMP_SQL = """
WITH sh AS ({simhash_cte}),
halves AS (
  SELECT doc_id, simhash,
         simhash // 65536 AS hi_half,
         simhash % 65536 AS lo_half
  FROM sh
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ANY_VALUE(a.simhash) AS sh_a, ANY_VALUE(b.simhash) AS sh_b
  FROM halves a JOIN halves b
    ON a.doc_id < b.doc_id
   AND (a.hi_half = b.hi_half OR a.lo_half = b.lo_half)
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(bit_count(CAST(xor(sh_a, sh_b) AS BIGINT)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(CAST(xor(sh_a, sh_b) AS BIGINT)) <= {t}
"""


def _dd_simhash_pairs_sql() -> str:
    from .llmdata import _dd_simhash_sql

    return _XSIMP_SQL.format(simhash_cte=_dd_simhash_sql(), t=_SIMHAM_MAX)


@query(
    "x_simhash_dedup_pairs",
    _dd_simhash_pairs_sql(),
    bench=True,
    doc=(
        "SimHash near-dup pairs (hamming ≤ 1) found by pigeonhole "
        "banding: split the 32-bit fingerprint into 2 halves; ≤1 "
        "differing bit leaves at least one half identical, so one "
        "bucket equi-join on either half is exhaustive — never an "
        "all-pairs product. Exact hamming (bit_count of xor) refines "
        "candidates; the fingerprint table is tiny (one long per doc), "
        "the standard simhash-dedup shape at 100 TB."
    ),
)
def x_simhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delegates to functions.similarity.simhash_hamming_pairs — the
    fingerprint-contracted banded implementation (property-tested
    against brute-force hamming in tests/test_round5_properties.py)."""
    from ..functions.similarity import simhash32, simhash_hamming_pairs

    sig = simhash32(read_table(spark, sf_dir, "documents"), "doc_id", "text")
    return simhash_hamming_pairs(
        sig, id_col="doc_id", fp_col="simhash", max_hamming=_SIMHAM_MAX
    )


# ---------------------------------------------------------------------------
# x_ann_sq8_rescore — two-stage retrieval: cheap SQ8 integer scan to a
# candidate pool, exact fixed-point cosine rerank of the pool (the
# production compressed-index + rescore pattern)
# ---------------------------------------------------------------------------

_SQ8_POOL = 50

_XSQ8R_SQL = f"""
WITH dims AS (
  SELECT vec_id, unnest(embedding) AS x, unnest(generate_series(1, 64)) AS i
  FROM embeddings
),
stats AS (
  SELECT i, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
  FROM dims WHERE vec_id <> 0 GROUP BY i
),
codes AS (
  SELECT d.vec_id, d.i,
         {_SQ8_Q.format(x="d.x", mn="s.mn", mx="s.mx")} AS qv
  FROM dims d JOIN stats s USING (i)
),
pool AS (
  SELECT c.vec_id, SUM((c.qv - qq.qv) * (c.qv - qq.qv)) AS d2
  FROM codes c JOIN codes qq ON qq.vec_id = 0 AND qq.i = c.i
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id
  ORDER BY d2 ASC, c.vec_id ASC LIMIT {_SQ8_POOL}
),
fx AS (
  SELECT vec_id, i, CAST(FLOOR(CAST(x AS DOUBLE) * 1048576) AS BIGINT) AS v
  FROM dims
),
dots AS (
  SELECT c.vec_id,
         SUM(c.v * q.v) AS dot, SUM(c.v * c.v) AS na
  FROM fx c JOIN fx q ON q.vec_id = 0 AND q.i = c.i
  WHERE c.vec_id IN (SELECT vec_id FROM pool)
  GROUP BY c.vec_id
),
qn AS (SELECT SUM(v * v) AS nb FROM fx WHERE vec_id = 0)
SELECT vec_id,
       CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS cosine
FROM dots, qn
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


@query(
    "x_ann_sq8_rescore",
    _XSQ8R_SQL,
    doc=(
        "Two-stage retrieval: SQ8 integer L2 narrows the corpus to a "
        f"{_SQ8_POOL}-candidate pool (4× smaller codes, pure-integer "
        "scan), then exact fixed-point cosine reranks only the pool — "
        "the compressed-index + rescore pattern every production vector "
        "store uses. The rescore side is a semi-join on the pool ids, "
        "so full-precision vectors are fetched for 50 rows, not the "
        "corpus."
    ),
)
def x_ann_sq8_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") != 0)
    stats = corpus.agg(
        F.array(
            *[F.min(F.col("embedding")[i].cast("double")) for i in range(64)]
        ).alias("mn"),
        F.array(
            *[F.max(F.col("embedding")[i].cast("double")) for i in range(64)]
        ).alias("mx"),
    )
    from ..caching import track_persist

    # codes are one short array per vector and feed 2+ downstream
    # consumers (query row, corpus scan, rescore pool) — persist so the
    # 128-agg stats pass and quantization run ONCE, not per consumer
    coded = track_persist(
        emb.crossJoin(F.broadcast(stats)).select(
            "vec_id", F.expr(_SQ8_SPARK_Q).alias("qv")
        )
    )
    qq = coded.filter(F.col("vec_id") == 0).select(F.col("qv").alias("qqv"))
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("qqv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pool = (
        coded.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qq))
        .select("vec_id", d2.alias("d2"))
        .orderBy(F.col("d2").asc(), F.col("vec_id").asc())
        .limit(_SQ8_POOL)
        .select("vec_id")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        corpus.join(F.broadcast(pool), "vec_id", "left_semi")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", cosine_against(F.col("qv"), F.col("embedding")).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# j7_range_band_join — non-equi theta join against a banded dimension
# (amount-tier lookup: the classic "which fee tier / risk band" shape)
# ---------------------------------------------------------------------------

_J7_SQL = """
SELECT b.band,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events e
JOIN (VALUES ('low',   CAST(0 AS DOUBLE),   CAST(10 AS DOUBLE)),
             ('mid',   CAST(10 AS DOUBLE),  CAST(50 AS DOUBLE)),
             ('high',  CAST(50 AS DOUBLE),  CAST(100 AS DOUBLE)),
             ('xhigh', CAST(100 AS DOUBLE), CAST(NULL AS DOUBLE))) AS b(band, lo, hi)
  ON e.value >= b.lo AND (b.hi IS NULL OR e.value < b.hi)
GROUP BY b.band
"""

_J7_BANDS = [
    ("low", 0.0, 10.0),
    ("mid", 10.0, 50.0),
    ("high", 50.0, 100.0),
    ("xhigh", 100.0, None),
]


@query(
    "j7_range_band_join",
    _J7_SQL,
    doc=(
        "Range (theta) join against a banded dimension: the tier-lookup "
        "shape (fee tiers, risk bands). The band table is bounded by "
        "construction → broadcast nested-loop with a 4-row inner side, "
        "evaluated as a map-side scan predicate; the fact side is never "
        "shuffled. Exact-decimal value sums."
    ),
)
def j7_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    bands = spark.createDataFrame(
        _J7_BANDS,
        StructType(
            [
                StructField("band", StringType(), False),
                StructField("lo", DoubleType(), False),
                StructField("hi", DoubleType(), True),
            ]
        ),
    )
    ev = events_table(spark, sf_dir)
    cond = (F.col("value") >= F.col("lo")) & (
        F.col("hi").isNull() | (F.col("value") < F.col("hi"))
    )
    return (
        ev.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(dec("value", 12, 2)).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# x_vocab_coverage — tokenizer-vocab OOV audit: rank a vocab from the
# corpus, measure per-doc out-of-vocabulary rate (fixed point)
# ---------------------------------------------------------------------------

_VOCAB_K = 10

_XVOC_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_transform(
    list_filter(string_split_regex(trim(text), ' +'), x -> x <> ''),
    x -> lower(x))) AS term
  FROM documents
),
cnts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term),
vocab AS (
  SELECT term FROM (
    SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rk FROM cnts
  ) WHERE rk <= {_VOCAB_K}
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST((1048576 * CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT))
            // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS oov_fp
FROM tok t LEFT JOIN vocab v ON v.term = t.term
GROUP BY t.doc_id
"""


@query(
    "x_vocab_coverage",
    _XVOC_SQL,
    doc=(
        f"Tokenizer-vocabulary OOV audit: learn a top-{_VOCAB_K} vocab "
        "(count DESC, term ASC — fully deterministic rank), then "
        "per-doc out-of-vocab rate in 2^20 fixed point. The vocab is "
        "bounded by construction (top-k), so broadcasting it is safe at "
        "any corpus size — unlike the unbounded full-vocabulary join "
        "x_top_terms deliberately shuffles."
    ),
)
def x_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.transform(ws_tokens("text"), F.lower)).alias("term")
    )
    cnts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        cnts.orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(_VOCAB_K)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.expr(
                "CAST((1048576 * CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT))"
                " div COUNT(*) AS BIGINT)"
            ).alias("oov_fp"),
        )
    )


# ---------------------------------------------------------------------------
# x_length_trim — percentile-window corpus filter (drop the length
# tails) with a scale-safe rank-on-distinct-values percentile
# ---------------------------------------------------------------------------

_XTRIM_SQL = """
WITH counts AS (SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY n_chars),
cum AS (SELECT n_chars, SUM(cnt) OVER (ORDER BY n_chars) AS cum FROM counts),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
b AS (
  SELECT MIN(CASE WHEN cum >= (n + 19) // 20 THEN n_chars END) AS lo,
         MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN n_chars END) AS hi
  FROM cum, tot
)
SELECT doc_id, n_chars FROM documents, b
WHERE n_chars >= lo AND n_chars <= hi
"""


@query(
    "x_length_trim",
    _XTRIM_SQL,
    doc=(
        "Percentile-tail corpus trim (keep p5..p95 by length): the "
        "discrete percentile comes from a cumulative sum over DISTINCT "
        "length values (ceil-rank k = ⌈0.05n⌉ — exact integers, no "
        "interpolated float percentile to disagree across engines). "
        "The window orders the bounded value domain, not the corpus — "
        "a global doc sort would be the 100 TB mistake; the bounds row "
        "broadcasts back as a scan predicate."
    ),
)
def x_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    counts = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum", F.sum("cnt").over(w))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    bounds = cum.crossJoin(F.broadcast(tot)).agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 19) div 20"), F.col("n_chars"))).alias(
            "lo"
        ),
        F.min(
            F.when(F.col("cum") >= F.expr("(19 * n + 19) div 20"), F.col("n_chars"))
        ).alias("hi"),
    )
    return (
        d.crossJoin(F.broadcast(bounds))
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "n_chars")
    )
