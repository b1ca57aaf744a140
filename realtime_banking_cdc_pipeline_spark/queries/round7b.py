"""Round-7 deterministic sketch operators (training-data-pipeline
extension surface; the reference has no sketches at all — its dedup is
exact event-id checks in `consumer/kafka_to_minio.py`).

The standard objection to oracle-checking sketches is that they are
"approximate"; but approximation is about the ESTIMATE's relation to
the truth, not about nondeterminism. With md5-derived hash functions
(the cross-engine house hash) every register / bit / counter is a pure
function of the data, so DuckDB replays the identical sketch and the
driver's strict value-hash holds. This upgrades the sketch family from
the rows-only check `a_approx_sketches` carries to full strict
verification:

- x_bloom_decontaminate — Bloom-filter membership screen of the corpus
  against a benchmark set (Bloom 1970): k=4 md5 hash functions into a
  4096-bit filter held as 64 longs — the bounded-size broadcast twin of
  exact-join decontamination, with the false-positive accounting made
  explicit (bloom_hit >= exact always; the gap IS the fp rate).
- x_hll_distinct — HyperLogLog registers (Flajolet et al. 2007) per
  source: bucket = low 6 hash bits, rank = leading-zero count of the
  remaining 54 bits via integer bit-length (no floats), estimate =
  alpha*m^2 / sum(2^-M_j) in 2^55 fixed point with ONE trailing double
  division. Raw estimator only (the small-range linear-counting branch
  needs ln, which is libm — zero-register count is reported so the
  caller can apply it; at deployment precision swap in real ln).
- x_cms_heavy_hitters — Count-Min sketch (Cormode & Muthukrishnan
  2005): depth 4 x width 256 counters over corpus tokens, point-query
  estimates for the exact top-20 tokens; est >= exact is the sketch's
  one-sided guarantee and the overestimate is reported.

All integer arithmetic; every hash is md5; nothing here needs more
than hash aggs + one broadcast-sized join (the sketch itself is
constant-size by construction — THE reason sketches exist at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_io import read_table
from .registry import query

_BLOOM_MOD = 29  # benchmark set: doc_id % 29 == 0 (the x_cross_corpus convention)
_BLOOM_BITS = 4096
_BLOOM_WORDS = _BLOOM_BITS // 32  # 32-bit words: shifts stay < 31 (DuckDB checks 1<<63 overflow)
_BLOOM_K = 4

_XBLOOM_SQL = f"""
WITH bench AS (
  SELECT DISTINCT text FROM documents WHERE doc_id % {_BLOOM_MOD} = 0
),
bpos AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5('bloom' || CAST(i AS VARCHAR) || ':' || text),
                             1, 7) AS BIGINT) % {_BLOOM_BITS} AS pos
  FROM bench, unnest(generate_series(0, {_BLOOM_K - 1})) AS t(i)
),
filt AS (
  SELECT pos // 32 AS word_idx,
         bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS bits
  FROM bpos GROUP BY 1
),
probe AS (
  SELECT d.doc_id,
         CAST('0x' || substr(md5('bloom' || CAST(t.i AS VARCHAR) || ':' || d.text),
                             1, 7) AS BIGINT) % {_BLOOM_BITS} AS pos
  FROM documents d, unnest(generate_series(0, {_BLOOM_K - 1})) AS t(i)
  WHERE d.doc_id % {_BLOOM_MOD} <> 0
),
hits AS (
  SELECT p.doc_id,
         SUM(CASE WHEN f.bits IS NOT NULL
                   AND (f.bits & (1::BIGINT << CAST(p.pos % 32 AS INTEGER)))
                       = (1::BIGINT << CAST(p.pos % 32 AS INTEGER))
                  THEN 1 ELSE 0 END) AS n_set
  FROM probe p LEFT JOIN filt f ON f.word_idx = p.pos // 32
  GROUP BY p.doc_id
),
ex AS (
  SELECT d.doc_id, MAX(CASE WHEN b.text IS NOT NULL THEN 1 ELSE 0 END) AS exact
  FROM documents d LEFT JOIN bench b ON b.text = d.text
  WHERE d.doc_id % {_BLOOM_MOD} <> 0
  GROUP BY d.doc_id
)
SELECT h.doc_id,
       (h.n_set = {_BLOOM_K}) AS bloom_hit,
       (ex.exact = 1) AS exact_dup
FROM hits h JOIN ex USING (doc_id)
"""


@query(
    "x_bloom_decontaminate",
    _XBLOOM_SQL,
    bench=True,
    doc=(
        "Bloom-filter decontamination screen (Bloom 1970): the "
        "benchmark set's distinct texts hash through k=4 md5 functions "
        "into a 4096-bit filter (128 32-bit words — CONSTANT size regardless "
        "of corpus scale, the whole point); every non-benchmark doc "
        "probes its 4 bit positions and flags bloom_hit iff all are "
        "set. exact_dup rides along so the one-sided guarantee "
        "(bloom_hit >= exact_dup, never a false negative) and the "
        "false-positive gap are both visible in the output. Scale: "
        "the filter is a 128-row broadcast; probing is a per-row "
        "expression + one tiny join; at 100 TB the filter for a "
        "billion-doc benchmark just grows bits (still KBs-MBs, still "
        "broadcast) while the exact-join alternative shuffles the "
        "benchmark against every shard."
    ),
)
def x_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = (
        d.filter(F.col("doc_id") % _BLOOM_MOD == 0).select("text").distinct()
    )
    idx = F.explode(
        F.array(*[F.lit(i) for i in range(_BLOOM_K)])
    ).alias("i")
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bloom"), F.col("i").cast("string"),
                        F.lit(":"), F.col("text"),
                    ).cast("binary")
                ),
                1, 7,
            ),
            16, 10,
        ).cast("long")
        % _BLOOM_BITS
    )
    bpos = (
        bench.select("text", idx)
        .select(pos.alias("pos"))
        .distinct()
    )
    filt = bpos.groupBy(F.expr("pos div 32").alias("word_idx")).agg(
        F.bit_or(F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))")).alias(
            "bits"
        )
    )
    corpus = d.filter(F.col("doc_id") % _BLOOM_MOD != 0)
    probe = corpus.select("doc_id", "text", idx).select(
        "doc_id", pos.alias("pos")
    )
    mask = F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))")
    hits = (
        probe.join(
            F.broadcast(filt),
            F.expr("pos div 32") == F.col("word_idx"),
            "left_outer",
        )
        .select(
            "doc_id",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(mask) == mask),
                1,
            )
            .otherwise(0)
            .alias("set_bit"),
        )
        .groupBy("doc_id")
        .agg(F.sum("set_bit").alias("n_set"))
    )
    ex = (
        corpus.join(
            bench.select(F.col("text").alias("btext")),
            F.col("text") == F.col("btext"),
            "left_outer",
        )
        .groupBy("doc_id")
        .agg(
            F.max(F.col("btext").isNotNull().cast("int")).alias("exact")
        )
    )
    return hits.join(ex, "doc_id").select(
        "doc_id",
        (F.col("n_set") == _BLOOM_K).alias("bloom_hit"),
        (F.col("exact") == 1).alias("exact_dup"),
    )


# ---------------------------------------------------------------------------
# x_hll_distinct — deterministic HyperLogLog per source
# ---------------------------------------------------------------------------

_HLL_M = 64  # registers (b = 6 bucket bits)
_HLL_W = 54  # value bits after the bucket (15 md5 hex digits = 60 bits)
_HLL_SCALE = 55  # fixed-point: sum(2^(SCALE - M_j)) fits bigint
# alpha_64 * m^2 * 2^SCALE as ONE python-precomputed double literal so
# both engines run literal / bigint -> the identical IEEE division
_HLL_NUM = 0.709 * (_HLL_M ** 2) * float(1 << _HLL_SCALE)

_XHLL_SQL = f"""
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
s AS (
  SELECT source,
         CAST(SUM(1::BIGINT << CAST({_HLL_SCALE} - m_j AS INTEGER)) AS BIGINT)
           AS sum_fp,
         CAST(COUNT(*) AS BIGINT) AS used
  FROM r GROUP BY 1
),
ex AS (
  SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact
  FROM documents GROUP BY 1
)
SELECT s.source,
       ex.n_exact,
       CAST(floor({_HLL_NUM!r} / (CAST(s.sum_fp AS DOUBLE)
             + CAST({_HLL_M} - s.used AS DOUBLE) * {float(1 << _HLL_SCALE)!r}))
            AS BIGINT) AS hll_estimate,
       CAST({_HLL_M} - s.used AS BIGINT) AS zero_registers
FROM s JOIN ex USING (source)
"""


@query(
    "x_hll_distinct",
    _XHLL_SQL,
    bench=True,
    doc=(
        "HyperLogLog distinct-count registers (Flajolet et al. 2007), "
        "fully deterministic: 60 md5 bits split into a 6-bit bucket "
        "and 54 value bits; rank = leading-zero count via integer "
        "bit-length (length(bin(w)) == bit_length, no floats); "
        "register table = one max-agg per (source, bucket) — 64 rows "
        "per source FOREVER, the constant-memory property that makes "
        "HLL the 100 TB distinct-count. The estimate is the raw HLL "
        "harmonic mean in 2^55 fixed point with exactly one trailing "
        "double division (empty registers contribute 2^SCALE each); "
        "the exact distinct and zero-register count ride along so the "
        "relative error and the linear-counting regime are visible. "
        "The same md5-determinism makes the DuckDB oracle replay the "
        "registers bit-for-bit — an approximate sketch under the "
        "STRICT hash gate."
    ),
)
def x_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sketches import hll_registers

    d = read_table(spark, sf_dir, "documents").select("source", "text")
    r = hll_registers(d, "source", "text").withColumnRenamed("key", "source")
    s = r.groupBy("source").agg(
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({_HLL_SCALE} - m_j as int))")
        )
        .cast("long")
        .alias("sum_fp"),
        F.count(F.lit(1)).cast("long").alias("used"),
    )
    ex = d.groupBy("source").agg(
        F.countDistinct("text").cast("long").alias("n_exact")
    )
    est = F.floor(
        F.lit(_HLL_NUM)
        / (
            F.col("sum_fp").cast("double")
            + (F.lit(_HLL_M) - F.col("used")).cast("double")
            * F.lit(float(1 << _HLL_SCALE))
        )
    ).cast("bigint")
    return s.join(ex, "source").select(
        "source",
        "n_exact",
        est.alias("hll_estimate"),
        (F.lit(_HLL_M) - F.col("used")).cast("bigint").alias("zero_registers"),
    )


# ---------------------------------------------------------------------------
# x_cms_heavy_hitters — deterministic Count-Min sketch point queries
# ---------------------------------------------------------------------------

from ..functions.sketches import CMS_D as _CMS_D  # noqa: E402
from ..functions.sketches import CMS_W as _CMS_W  # noqa: E402
_CMS_TOPK = 20

_CMS_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x <> '')"
)

_XCMS_SQL = f"""
WITH tok AS (
  SELECT unnest({_CMS_TOKS}) AS term FROM documents
),
exact AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM tok GROUP BY term
),
cells AS (
  SELECT t.i AS row_idx,
         CAST('0x' || substr(md5('cms' || CAST(t.i AS VARCHAR) || ':' || term),
                             1, 7) AS BIGINT) % {_CMS_W} AS col_idx,
         CAST(SUM(exact_cnt) AS BIGINT) AS cnt
  FROM exact, unnest(generate_series(0, {_CMS_D - 1})) AS t(i)
  GROUP BY 1, 2
),
top AS (
  SELECT term, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, term ASC LIMIT {_CMS_TOPK}
),
probes AS (
  SELECT top.term, top.exact_cnt, t.i AS row_idx,
         CAST('0x' || substr(md5('cms' || CAST(t.i AS VARCHAR) || ':' || term),
                             1, 7) AS BIGINT) % {_CMS_W} AS col_idx
  FROM top, unnest(generate_series(0, {_CMS_D - 1})) AS t(i)
)
SELECT p.term,
       p.exact_cnt,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate,
       CAST(MIN(c.cnt) - p.exact_cnt AS BIGINT) AS overestimate
FROM probes p JOIN cells c USING (row_idx, col_idx)
GROUP BY p.term, p.exact_cnt
"""


@query(
    "x_cms_heavy_hitters",
    _XCMS_SQL,
    bench=True,
    doc=(
        "Count-Min sketch point queries (Cormode & Muthukrishnan "
        "2005): 4 md5-salted hash rows x 256 counters aggregate the "
        "corpus token stream (map-side-combinable — the sketch is a "
        "1024-cell table no matter the corpus size); the exact top-20 "
        "terms probe their 4 cells and take the min. The one-sided "
        "guarantee (estimate >= exact) surfaces as the reported "
        "overestimate column. Deterministic md5 hashing makes the "
        "oracle replay every counter exactly — strict-hash-checked "
        "like the Bloom and HLL twins. Scale: build is one hash agg "
        "over (row, col); probes join against the 1024-row sketch "
        "(broadcast-sized by construction)."
    ),
)
def x_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from ..functions.sketches import cms_cells, cms_estimates

    d = read_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), " +"), lambda t: t != ""
    )
    # term counts contract the stream FIRST; the sketch (and its md5
    # per salt row) is then built over the distinct vocabulary, not the
    # raw token stream — identical counters, |vocab| x depth hashes.
    # Cell build + probe are the SHARED primitives the streaming
    # heavy-hitters monitor folds incrementally (streaming/metrics.py)
    # — parity between this batch sketch and the streamed store is the
    # monitor's pinned invariant.
    exact = track_persist(
        d.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    cells = cms_cells(exact, "term", "exact_cnt")
    top = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("term").asc()
    ).limit(_CMS_TOPK)
    return (
        top.join(cms_estimates(cells, top.select("term")), "term")
        .select(
            "term",
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_cnt"))
            .cast("long")
            .alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# x_source_diversity — exact lexical-diversity profile per source
# ---------------------------------------------------------------------------

_DIV_PPM = 1_000_000

_XDIV_SQL = f"""
WITH tok AS (
  SELECT source, unnest({_CMS_TOKS}) AS term FROM documents
),
tc AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         SUM(CAST(cnt AS HUGEINT) * cnt) AS sum_sq,
         CAST(MAX(cnt) AS BIGINT) AS top_cnt
  FROM tc GROUP BY 1
)
SELECT source, n_tokens, n_types,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE ({_DIV_PPM} * sum_sq)
                 // (CAST(n_tokens AS HUGEINT) * n_tokens) END AS BIGINT)
         AS simpson_ppm,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE ({_DIV_PPM} * n_types) // n_tokens END AS BIGINT) AS ttr_ppm,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE ({_DIV_PPM} * top_cnt) // n_tokens END AS BIGINT)
         AS top_share_ppm
FROM agg
"""


@query(
    "x_source_diversity",
    _XDIV_SQL,
    doc=(
        "Per-source lexical-diversity profile — the corpus-mix "
        "diagnostic a data-curation pipeline watches before weighting "
        "sources: Simpson concentration sum(p_i^2) (the repeated-draw "
        "collision probability; high = templated/boilerplate source), "
        "type-token ratio, and the single most frequent term's share, "
        "all as exact integer ppm (sum of squared counts over squared "
        "total — no floats anywhere, so the oracle matches bit-for-"
        "bit). Two map-side-combinable hash aggs (term counts, then "
        "per-source moments); nothing global-sorts; output is one row "
        "per source."
    ),
)
def x_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), " +"), lambda t: t != ""
    )
    tc = (
        d.select("source", F.explode(toks).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    agg = tc.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        # 128-bit intermediates (DECIMAL(38,0) here, HUGEINT in the
        # oracle): cnt^2 sums and the ppm product overflow int64 past
        # ~3e6 tokens/source, where non-ANSI Spark would wrap silently
        # while DuckDB errors — the house rule is exact wide decimals.
        F.sum(F.col("cnt").cast("decimal(19,0)") * F.col("cnt"))
        .cast("decimal(38,0)")
        .alias("sum_sq"),
        F.max("cnt").cast("long").alias("top_cnt"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        F.expr(
            f"CASE WHEN n_tokens = 0 THEN 0"
            f" ELSE (CAST({_DIV_PPM} AS DECIMAL(38,0)) * sum_sq)"
            f" div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) END"
        )
        .cast("long")
        .alias("simpson_ppm"),
        F.expr(
            f"CASE WHEN n_tokens = 0 THEN 0"
            f" ELSE ({_DIV_PPM} * n_types) div n_tokens END"
        )
        .cast("long")
        .alias("ttr_ppm"),
        F.expr(
            f"CASE WHEN n_tokens = 0 THEN 0"
            f" ELSE ({_DIV_PPM} * top_cnt) div n_tokens END"
        )
        .cast("long")
        .alias("top_share_ppm"),
    )


# ---------------------------------------------------------------------------
# x_heldout_likelihood — split-hygienic LM evaluation (train -> validation)
# ---------------------------------------------------------------------------

_HLM_SCALE = 1 << 20

_XHLM_SQL = f"""
WITH sp AS (
  SELECT doc_id,
         CAST('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 7)
              AS BIGINT) % 100 AS b
  FROM documents
),
toks AS (
  SELECT d.doc_id, sp.b, list_transform(
    list_filter(string_split_regex(trim(d.text), ' +'), x -> x <> ''),
    x -> lower(x)) AS t
  FROM documents d JOIN sp USING (doc_id)
),
tr_uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS u
  FROM (SELECT unnest(t) AS w FROM toks WHERE b < 90) GROUP BY w
),
tr_big AS (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS bcnt
  FROM (SELECT unnest(list_transform(range(2, len(t) + 1),
                      i -> t[i-1] || ' ' || t[i])) AS bg
        FROM toks WHERE b < 90) GROUP BY bg
),
consts AS (
  SELECT CAST(COALESCE(SUM(u), 0) + COUNT(*) + 1 AS BIGINT) AS cprime
  FROM tr_uni
),
vb AS (
  SELECT doc_id, unnest(list_transform(range(2, len(t) + 1),
                        i -> t[i-1] || ' ' || t[i])) AS bg
  FROM toks WHERE b >= 90 AND b < 95
),
vbt AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS bf FROM vb GROUP BY 1, 2),
p AS (
  SELECT vbt.doc_id, vbt.bf,
         CAST(({_HLM_SCALE} * (3 * COALESCE(tb.bcnt, 0) * consts.cprime
                               + (COALESCE(u2.u, 0) + 1) * (COALESCE(u1.u, 0) + 1)))
              // (4 * (COALESCE(u1.u, 0) + 1) * consts.cprime) AS BIGINT) AS p_fp
  FROM vbt
  LEFT JOIN tr_big tb ON tb.bg = vbt.bg
  LEFT JOIN tr_uni u1 ON u1.w = string_split(vbt.bg, ' ')[1]
  LEFT JOIN tr_uni u2 ON u2.w = string_split(vbt.bg, ' ')[2],
  consts
)
SELECT doc_id,
       CAST(SUM(bf) AS BIGINT) AS n_bigrams,
       CAST(CAST(SUM(bf * p_fp) AS BIGINT) // CAST(SUM(bf) AS BIGINT)
            AS BIGINT) AS score_fp
FROM p GROUP BY doc_id
"""


@query(
    "x_heldout_likelihood",
    _XHLM_SQL,
    doc=(
        "Split-hygienic language-model evaluation: the interpolated "
        "bigram LM (x_bigram_likelihood's exact-rational form) is "
        "TRAINED on the train split only (the md5 90/5/5 assignment "
        "every export op shares) and scored on the VALIDATION split — "
        "the train/eval separation a real data pipeline must enforce "
        "before quoting any LM-quality number, with add-one unigram "
        "smoothing so unseen validation vocabulary keeps the rational "
        "exact (no division by zero, no floats; perplexity's exp/log "
        "is deliberately absent — the fixed-point mean likelihood is "
        "monotone in it). Train counts join the validation bigrams on "
        "term keys with no broadcast hint (vocab unbounded); the "
        "smoothing constant is the one broadcast scalar. Composes the "
        "registered split, tokenizer, and LM machinery — nothing new "
        "to operate at 100 TB beyond what those already pin."
    ),
)
def x_heldout_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sampling import split_bucket
    from ..functions.text import ws_tokens

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        split_bucket(F.col("doc_id")).alias("b"),
        F.transform(ws_tokens("text"), F.lower).alias("t"),
    )
    tr = toks.filter(F.col("b") < 90)
    va = toks.filter((F.col("b") >= 90) & (F.col("b") < 95))
    tr_uni = (
        tr.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("u"))
    )
    bg_expr = F.expr(
        "transform(sequence(2, size(t)), i -> concat_ws(' ', t[i-2], t[i-1]))"
    )
    tr_big = (
        tr.select(F.explode(bg_expr).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bcnt"))
    )
    consts = tr_uni.agg(
        (F.coalesce(F.sum("u"), F.lit(0)) + F.count(F.lit(1)) + 1)
        .cast("bigint")
        .alias("cprime")
    )
    vbt = (
        va.select("doc_id", F.explode(bg_expr).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bf"))
    )
    u1 = tr_uni.select(F.col("w").alias("w1"), F.col("u").alias("u1"))
    u2 = tr_uni.select(F.col("w").alias("w2"), F.col("u").alias("u2"))
    p = (
        vbt.withColumn("w1", F.split("bg", " ").getItem(0))
        .withColumn("w2", F.split("bg", " ").getItem(1))
        .join(tr_big, "bg", "left_outer")
        .join(u1, "w1", "left_outer")
        .join(u2, "w2", "left_outer")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "bf",
            F.expr(
                f"CAST(({_HLM_SCALE} * (3 * COALESCE(bcnt, 0) * cprime"
                " + (COALESCE(u2, 0) + 1) * (COALESCE(u1, 0) + 1)))"
                " div (4 * (COALESCE(u1, 0) + 1) * cprime) AS BIGINT)"
            ).alias("p_fp"),
        )
    )
    return p.groupBy("doc_id").agg(
        F.sum("bf").cast("bigint").alias("n_bigrams"),
        F.expr(
            "CAST(CAST(SUM(bf * p_fp) AS BIGINT) div CAST(SUM(bf) AS BIGINT)"
            " AS BIGINT)"
        ).alias("score_fp"),
    )


# ---------------------------------------------------------------------------
# x_langid_eval — classifier evaluation: heuristic LID vs the labeled column
# ---------------------------------------------------------------------------

_XLID_SQL = f"""
WITH pred AS (
  SELECT doc_id, lang,
         CASE WHEN 100 * len(list_filter({_CMS_TOKS},
                x -> list_contains(['a','an','and','are','as','at','be','by',
                                    'for','from','has','he','in','is','it',
                                    'its','of','on','that','the','to','was',
                                    'were','will','with'], x)))
                > 3 * len({_CMS_TOKS})
              THEN 'en' ELSE 'unk' END AS pred
  FROM documents
),
cm AS (
  SELECT lang AS label, pred, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN (label = 'en') = (pred = 'en') THEN n ELSE 0 END)
              AS BIGINT) AS agree
  FROM cm
)
SELECT cm.label, cm.pred, cm.n,
       CAST((1000000 * tot.agree) // tot.total AS BIGINT) AS overall_accuracy_ppm
FROM cm, tot
"""


@query(
    "x_langid_eval",
    _XLID_SQL,
    doc=(
        "Classifier-evaluation pattern over the labeled corpus: the "
        "heuristic language ID (functions/text.py:lang_id_en — "
        "stopword-hit ratio, a deterministic stand-in for a fastText "
        "LID) scores every doc and the confusion matrix against the "
        "labeled `lang` column comes out as one hash agg, with binary "
        "(en vs non-en) accuracy in exact integer ppm on every row. "
        "The comparison is cross-multiplied (100*hits > 3*tokens — "
        "the 0.03 ratio threshold with no division), so both engines "
        "agree bit-for-bit. This is the eval harness shape every "
        "learned filter (quality classifier, LID, toxicity) plugs "
        "into before gating a 100 TB corpus: label sample, confusion, "
        "threshold sweep — all shuffle-once aggregations."
    ),
)
def x_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import stopword_hits, ws_token_count

    d = read_table(spark, sf_dir, "documents")
    # cross-multiplied form of lang_id_en's ratio > 0.03 (no division)
    pred = d.select(
        "doc_id",
        "lang",
        F.when(
            100 * stopword_hits(F.col("text")) > 3 * ws_token_count(F.col("text")),
            F.lit("en"),
        )
        .otherwise(F.lit("unk"))
        .alias("pred"),
    )
    cm = pred.groupBy(F.col("lang").alias("label"), "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cm.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum(
            F.when(
                (F.col("label") == "en") == (F.col("pred") == "en"), F.col("n")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("agree"),
    )
    return cm.crossJoin(F.broadcast(tot)).select(
        "label",
        "pred",
        "n",
        F.expr("(1000000 * agree) div total")
        .cast("bigint")
        .alias("overall_accuracy_ppm"),
    )


# ---------------------------------------------------------------------------
# x_filter_threshold_sweep — operating-point sweep for a corpus gate
# ---------------------------------------------------------------------------

_SWEEP_SCALE = 1 << 20
_SWEEP_STEPS = 9  # decile thresholds 0.1 .. 0.9 of the score scale


def _dd_sweep_sql() -> str:
    from .round7 import _dd_gopher_sql

    steps = ", ".join(
        str((j * _SWEEP_SCALE) // 10) for j in range(1, _SWEEP_STEPS + 1)
    )
    return f"""
WITH g AS ({_dd_gopher_sql()}),
sc AS (
  SELECT d.doc_id, g.keep,
         CAST(CASE WHEN len({_CMS_TOKS}) = 0 THEN 0
              ELSE ({_SWEEP_SCALE} * len(list_filter({_CMS_TOKS},
                x -> list_contains(['a','an','and','are','as','at','be','by',
                                    'for','from','has','he','in','is','it',
                                    'its','of','on','that','the','to','was',
                                    'were','will','with'], x))))
              // (2 * len({_CMS_TOKS})) END
            + CASE WHEN length(d.text) = 0 THEN 0
              ELSE ({_SWEEP_SCALE} * length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')))
              // (2 * length(d.text)) END AS BIGINT) AS qual_fp
  FROM documents d JOIN g USING (doc_id)
),
th AS (SELECT unnest([{steps}]) AS threshold_fp),
cm AS (
  SELECT th.threshold_fp,
         CAST(SUM(CASE WHEN qual_fp >= th.threshold_fp AND keep THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN qual_fp >= th.threshold_fp AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN qual_fp < th.threshold_fp AND keep THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN qual_fp < th.threshold_fp AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM sc, th GROUP BY 1
)
SELECT threshold_fp, tp, fp, fn, tn,
       CAST(CASE WHEN tp + fp = 0 THEN 0
            ELSE (1000000 * tp) // (tp + fp) END AS BIGINT) AS precision_ppm,
       CAST(CASE WHEN tp + fn = 0 THEN 0
            ELSE (1000000 * tp) // (tp + fn) END AS BIGINT) AS recall_ppm
FROM cm
"""


@query(
    "x_filter_threshold_sweep",
    _dd_sweep_sql(),
    doc=(
        "Operating-point sweep for a corpus quality gate: the integer "
        "fixed-point quality score (the x_dedup_keep_best scorer: "
        "stopword share + alpha share, 2^20 scale) is swept against "
        "nine decile thresholds with the Gopher rule verdict as the "
        "reference label, yielding the TP/FP/FN/TN table and exact "
        "integer-ppm precision/recall per threshold (zero-denominator "
        "guarded on both engines). ONE pass over the corpus: the per-"
        "doc (score, label) row cross-joins a 9-row broadcast "
        "threshold table and reduces in a single hash agg — the sweep "
        "costs the same as a single-threshold evaluation, which is "
        "why a pipeline tunes its gate this way at 100 TB instead of "
        "re-running the filter per candidate threshold."
    ),
)
def x_filter_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import stopword_hits, ws_tokens
    from .round7 import x_gopher_rules

    d = read_table(spark, sf_dir, "documents")
    keep = x_gopher_rules(spark, sf_dir).select("doc_id", "keep")
    ntok = F.size(ws_tokens("text"))
    nalpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    qual_fp = F.expr(
        f"CAST(CASE WHEN n_tok = 0 THEN 0"
        f" ELSE ({_SWEEP_SCALE} * n_stop) div (2 * n_tok) END"
        f" + CASE WHEN n_chars = 0 THEN 0"
        f" ELSE ({_SWEEP_SCALE} * n_alpha) div (2 * n_chars) END AS BIGINT)"
    )
    sc = (
        d.select(
            "doc_id",
            stopword_hits("text").alias("n_stop"),
            ntok.alias("n_tok"),
            nalpha.alias("n_alpha"),
            F.length("text").alias("n_chars"),
        )
        .select("doc_id", qual_fp.alias("qual_fp"))
        .join(keep, "doc_id")
    )
    th = spark.createDataFrame(
        [((j * _SWEEP_SCALE) // 10,) for j in range(1, _SWEEP_STEPS + 1)],
        "threshold_fp bigint",
    )
    hit = F.col("qual_fp") >= F.col("threshold_fp")
    cm = (
        sc.crossJoin(F.broadcast(th))
        .groupBy("threshold_fp")
        .agg(
            F.sum((hit & F.col("keep")).cast("int")).cast("bigint").alias("tp"),
            F.sum((hit & ~F.col("keep")).cast("int")).cast("bigint").alias("fp"),
            F.sum((~hit & F.col("keep")).cast("int")).cast("bigint").alias("fn"),
            F.sum((~hit & ~F.col("keep")).cast("int")).cast("bigint").alias("tn"),
        )
    )
    return cm.select(
        "threshold_fp", "tp", "fp", "fn", "tn",
        F.expr(
            "CAST(CASE WHEN tp + fp = 0 THEN 0"
            " ELSE (1000000 * tp) div (tp + fp) END AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(CASE WHEN tp + fn = 0 THEN 0"
            " ELSE (1000000 * tp) div (tp + fn) END AS BIGINT)"
        ).alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# x_dataset_card — one-row corpus profile (the "dataset card" numbers)
# ---------------------------------------------------------------------------


def _dd_card_sql() -> str:
    from .round7 import _XSUB_K, _dd_gopher_sql

    return f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
  FROM documents
),
tok AS (
  SELECT CAST(SUM(len({_CMS_TOKS})) AS BIGINT) AS n_tokens FROM documents
),
g AS ({_dd_gopher_sql()}),
gp AS (SELECT CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       FROM g),
ng AS (
  SELECT md5(array_to_string(toks[u.p + 1 : u.p + {_XSUB_K}], ' ')) AS gg
  FROM (SELECT {_CMS_TOKS} AS toks FROM documents) d,
       LATERAL unnest(generate_series(0, len(toks) - {_XSUB_K})) AS u(p)
  WHERE len(toks) >= {_XSUB_K}
),
gr AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_rep_gram_occ
  FROM (SELECT gg, COUNT(*) AS c FROM ng GROUP BY gg)
)
SELECT base.n_docs, base.n_distinct_texts, base.n_sources, base.n_langs,
       tok.n_tokens,
       CAST((1000000 * (base.n_docs - base.n_distinct_texts)) // base.n_docs
            AS BIGINT) AS exact_dup_ppm,
       CAST(tok.n_tokens // base.n_docs AS BIGINT) AS mean_doc_tokens,
       CAST((1000000 * gp.n_pass) // base.n_docs AS BIGINT) AS gopher_pass_ppm,
       CAST(CASE WHEN gr.n_grams = 0 THEN 0
            ELSE (1000000 * gr.n_rep_gram_occ) // gr.n_grams END AS BIGINT)
         AS repeated_gram_occ_ppm
FROM base, tok, gp, gr
"""


@query(
    "x_dataset_card",
    _dd_card_sql(),
    doc=(
        "The dataset-card numbers in one row: corpus size, distinct-"
        "text/exact-dup rate, source and language cardinalities, token "
        "mass, mean document length, Gopher-rule pass rate, and the "
        "share of k-gram occurrences that are corpus-repeated (the "
        "ExactSubstr boilerplate mass) — every rate in exact integer "
        "ppm. Four independent aggregation subtrees (profile counts, "
        "token mass, rule verdicts, gram occupancy), each a map-side-"
        "combinable hash agg reducing to ONE row, cross-joined at the "
        "end (broadcast of single rows — the only join shape here). "
        "This is the artifact a data release publishes next to its "
        "manifests (x_dataset_manifest carries the per-shard twin)."
    ),
)
def x_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from .round7 import _shingle_frame, x_gopher_rules

    d = read_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), " +"), lambda t: t != ""
    )
    base = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("text").cast("bigint").alias("n_distinct_texts"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    tok = d.select(F.size(toks).alias("nt")).agg(
        F.sum("nt").cast("bigint").alias("n_tokens")
    )
    gp = (
        x_gopher_rules(spark, sf_dir)
        .agg(
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_pass")
        )
    )
    # the repeated-gram subtree IS the ExactSubstr shingle substrate
    # (round7._shingle_frame, persisted): co-run with the substring ops
    # the CacheManager serves it once instead of re-exploding the corpus
    ng = track_persist(_shingle_frame(spark, sf_dir)).select(
        F.col("g").alias("gg")
    )
    gr = (
        ng.groupBy("gg")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_rep_gram_occ"),
        )
    )
    return (
        base.crossJoin(F.broadcast(tok))
        .crossJoin(F.broadcast(gp))
        .crossJoin(F.broadcast(gr))
        .select(
            "n_docs", "n_distinct_texts", "n_sources", "n_langs", "n_tokens",
            F.expr("(1000000 * (n_docs - n_distinct_texts)) div n_docs")
            .cast("bigint")
            .alias("exact_dup_ppm"),
            F.expr("n_tokens div n_docs").cast("bigint").alias("mean_doc_tokens"),
            F.expr("(1000000 * n_pass) div n_docs")
            .cast("bigint")
            .alias("gopher_pass_ppm"),
            F.expr(
                "CASE WHEN n_grams = 0 THEN 0"
                " ELSE (1000000 * n_rep_gram_occ) div n_grams END"
            )
            .cast("bigint")
            .alias("repeated_gram_occ_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# x_embedding_centroids — per-source centroid drift vs the global centroid
# ---------------------------------------------------------------------------

_CENT_FX = "CAST(FLOOR(CAST({v} AS DOUBLE) * 1048576) AS BIGINT)"

_XCENT_SQL = f"""
WITH e AS (
  SELECT d.source, em.vec_id, em.embedding
  FROM embeddings em JOIN documents d ON d.doc_id = em.vec_id
),
dims AS (
  SELECT source, vec_id,
         generate_subscripts(embedding, 1) AS i,
         {_CENT_FX.format(v='unnest(embedding)')} AS x
  FROM e
),
s AS (
  SELECT source, i, CAST(SUM(x) AS BIGINT) AS sv,
         CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
  FROM dims GROUP BY 1, 2
),
g AS (SELECT i, CAST(SUM(x) AS BIGINT) AS gv FROM dims GROUP BY 1),
dots AS (
  SELECT s.source, MAX(s.n) AS n_vecs,
         SUM(CAST(s.sv AS DECIMAL(38,0)) * CAST(g.gv AS DECIMAL(38,0))) AS dot,
         SUM(CAST(s.sv AS DECIMAL(38,0)) * CAST(s.sv AS DECIMAL(38,0))) AS na
  FROM s JOIN g USING (i) GROUP BY s.source
),
gn AS (SELECT SUM(CAST(gv AS DECIMAL(38,0)) * CAST(gv AS DECIMAL(38,0))) AS nb
       FROM g)
SELECT dots.source,
       CAST(dots.n_vecs AS BIGINT) AS n_vecs,
       CAST(dots.dot AS DOUBLE) / sqrt(CAST(dots.na AS DOUBLE) * CAST(gn.nb AS DOUBLE))
         AS cos_to_global
FROM dots, gn
"""


@query(
    "x_embedding_centroids",
    _XCENT_SQL,
    doc=(
        "Per-source embedding-centroid drift: cosine of each source's "
        "centroid to the global corpus centroid — the embedding-space "
        "twin of the source-reputation gate (a source whose centroid "
        "drifts is shifting domain). Scale-invariance of cosine lets "
        "the means stay UNDIVIDED: per-dimension exact fixed-point "
        "sums (one hash agg keyed by (source, dim)), the cross dots "
        "accumulate in DECIMAL(38,0) (sum-of-products of per-dim sums "
        "— exact, order-independent, the house decimal rule), and the "
        "ONLY floating-point op is the final cosine division written "
        "identically on both engines. No arrays are re-assembled, no "
        "vector ever crosses a shuffle — just (key, dim, sum) rows; "
        "dim count bounds every row group, so a billion vectors cost "
        "one map-side-combinable agg."
    ),
)
def x_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    dims = (
        emb.join(docs, "vec_id")
        .select("source", "vec_id", F.posexplode("embedding").alias("i0", "v"))
        .select(
            "source",
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.expr("CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)").alias(
                "x"
            ),
        )
    )
    s = dims.groupBy("source", "i").agg(
        F.sum("x").cast("bigint").alias("sv"),
        F.countDistinct("vec_id").cast("bigint").alias("n"),
    )
    g = dims.groupBy("i").agg(F.sum("x").cast("bigint").alias("gv"))
    dots = (
        s.join(g, "i")
        .groupBy("source")
        .agg(
            F.max("n").alias("n_vecs"),
            F.sum(
                F.col("sv").cast("decimal(38,0)") * F.col("gv").cast("decimal(38,0)")
            ).alias("dot"),
            F.sum(
                F.col("sv").cast("decimal(38,0)") * F.col("sv").cast("decimal(38,0)")
            ).alias("na"),
        )
    )
    gn = g.agg(
        F.sum(
            F.col("gv").cast("decimal(38,0)") * F.col("gv").cast("decimal(38,0)")
        ).alias("nb")
    )
    return dots.crossJoin(F.broadcast(gn)).select(
        "source",
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        (
            F.col("dot").cast("double")
            / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
        ).alias("cos_to_global"),
    )


# ---------------------------------------------------------------------------
# x_winnowing_matches — MOSS-style document match candidates
# ---------------------------------------------------------------------------

_WMATCH_MIN = 2  # shared fingerprints to flag a pair
_WMATCH_DF_CAP = 64  # fingerprints in more docs than this are corpus
                     # boilerplate: excluded here (the ExactSubstr path
                     # owns them), which also bounds the pair fan-out


def _dd_wmatch_sql() -> str:
    from .round7 import _XWIN_SQL

    return f"""
WITH w AS ({_XWIN_SQL}),
fp_docs AS (SELECT DISTINCT doc_id, fp FROM w),
df AS (
  SELECT fp, COUNT(*) AS n_docs FROM fp_docs GROUP BY fp
),
elig AS (SELECT fp FROM df WHERE n_docs BETWEEN 2 AND {_WMATCH_DF_CAP}),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp_docs a
  JOIN fp_docs b ON a.fp = b.fp AND a.doc_id < b.doc_id
  JOIN elig ON elig.fp = a.fp
)
SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pairs GROUP BY id_a, id_b
HAVING COUNT(*) >= {_WMATCH_MIN}
"""


@query(
    "x_winnowing_matches",
    _dd_wmatch_sql(),
    doc=(
        "MOSS match candidates (Schleimer et al. 2003 §5): document "
        "pairs sharing >= 2 winnowing fingerprints, with the shared "
        "count — the plagiarism/reuse detector the fingerprints exist "
        "for. Fingerprints present in more than 64 docs are excluded "
        "as corpus boilerplate (the ExactSubstr family owns those), "
        "which simultaneously BOUNDS the self-join fan-out at "
        "sum(min(df,64)^2) — the same occupancy-cap discipline as the "
        "skew-proof keep-first; the cap is mirrored in the oracle so "
        "it is part of the checked contract. One distinct + one "
        "df-count agg + one capped self-equi-join + one pair count."
    ),
)
def x_winnowing_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from .round7 import x_winnowing

    fp_docs = track_persist(
        x_winnowing(spark, sf_dir).select("doc_id", "fp").distinct()
    )
    df_tab = fp_docs.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    elig = df_tab.filter(
        F.col("n_docs").between(2, _WMATCH_DF_CAP)
    ).select("fp")
    a = fp_docs.select(F.col("doc_id").alias("id_a"), "fp")
    b = fp_docs.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(elig, "fp")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= _WMATCH_MIN)
    )


# ---------------------------------------------------------------------------
# x_semdedup_keep_best — semantic components keep the best-QUALITY doc
# ---------------------------------------------------------------------------


def _dd_sdkb_sql() -> str:
    from .llmdata import _FXQ
    from .round6b import _SEMDEDUP_THRESHOLD, _dd_two_level_cells_cte

    fx = _FXQ.format
    return f"""
WITH RECURSIVE {_dd_two_level_cells_cte()},
m AS (SELECT cells.vec_id, cells.cid, e.embedding
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
q AS (
  SELECT doc_id AS vec_id,
         CAST(CASE WHEN len({_CMS_TOKS}) = 0 THEN 0
              ELSE (1048576 * len(list_filter({_CMS_TOKS},
                x -> list_contains(['a','an','and','are','as','at','be','by',
                                    'for','from','has','he','in','is','it',
                                    'its','of','on','that','the','to','was',
                                    'were','will','with'], x))))
              // (2 * len({_CMS_TOKS})) END
            + CASE WHEN length(text) = 0 THEN 0
              ELSE (1048576 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
              // (2 * length(text)) END AS BIGINT) AS qual_fp
  FROM documents
),
sel AS (
  SELECT comp.component, comp.vec_id, q.qual_fp,
         COUNT(*) OVER (PARTITION BY comp.component) AS n_members,
         ROW_NUMBER() OVER (PARTITION BY comp.component
                            ORDER BY q.qual_fp DESC, comp.vec_id ASC) AS rk
  FROM comp JOIN q USING (vec_id)
)
SELECT component,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(vec_id AS BIGINT) AS kept_vec_id,
       CAST(qual_fp AS BIGINT) AS kept_qual_fp
FROM sel WHERE rk = 1
"""


@query(
    "x_semdedup_keep_best",
    _dd_sdkb_sql(),
    doc=(
        "Cross-modal dedup composition: semantic duplicate COMPONENTS "
        "come from embedding space (the adaptive-k SemDeDup cell pairs "
        "-> min-label components, exactly x_semdedup_diverse's "
        "machinery) while the survivor is chosen by TEXT quality (the "
        "x_dedup_keep_best integer scorer over the doc joined on "
        "vec_id) — keep the best-written copy of each semantic "
        "cluster, the rule an LLM-data pipeline actually wants "
        "(SemDeDup finds the duplicates; quality decides who stays). "
        "One max_by hash agg per component with the (qual, -id) "
        "deterministic tiebreak; everything upstream is the already-"
        "scale-proven adaptive-cell pair generation."
    ),
)
def x_semdedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from ..functions.similarity import fx_dot
    from ..functions.text import stopword_hits, ws_tokens
    from ..operators.components import connected_components
    from .llmdata import _emb
    from .round6b import _SEMDEDUP_THRESHOLD, _two_level_cells

    emb, cells = _two_level_cells(spark, _emb(spark, sf_dir))
    m = track_persist(
        cells.select("vec_id", "cid")
        .join(emb, "vec_id")
        .select("vec_id", "cid", "embedding")
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
    d = read_table(spark, sf_dir, "documents")
    qual_fp = F.expr(
        "CAST(CASE WHEN n_tok = 0 THEN 0"
        " ELSE (1048576 * n_stop) div (2 * n_tok) END"
        " + CASE WHEN n_chars = 0 THEN 0"
        " ELSE (1048576 * n_alpha) div (2 * n_chars) END AS BIGINT)"
    )
    q = d.select(
        F.col("doc_id").alias("vec_id"),
        stopword_hits("text").alias("n_stop"),
        F.size(ws_tokens("text")).alias("n_tok"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.length("text").alias("n_chars"),
    ).select("vec_id", qual_fp.alias("qual_fp"))
    joined = comp.join(q, "vec_id")
    return joined.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max_by(
            F.col("vec_id"), F.struct(F.col("qual_fp"), (-F.col("vec_id")))
        )
        .cast("bigint")
        .alias("kept_vec_id"),
        F.max(F.struct(F.col("qual_fp"), (-F.col("vec_id"))))
        .getField("qual_fp")
        .cast("bigint")
        .alias("kept_qual_fp"),
    )
