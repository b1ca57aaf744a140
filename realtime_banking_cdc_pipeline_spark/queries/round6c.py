"""Round-6 third batch — training-data export / decontamination depth
plus two banking monitors (reference analog: the curation stages ahead
of the reference's Gold marts, `models/gold/*.sql`; the reference has
no export/decontamination tooling — these are the 100 TB
training-pipeline extensions the survey calls for):

- x_cross_corpus_dedup — decontaminate a train corpus against a
  bounded benchmark/holdout corpus (exact + MinHash-LSH near match).
- x_curriculum_order — exact global curriculum position without a
  global sort (cell-count cumsum + cell-partitioned windows).
- x_dataset_manifest — per-shard export manifests (counts, sizes,
  order-independent content checksum).
- x_length_bucket_batching — length-banded dynamic batching with
  per-batch padding-waste accounting.
- a_dormant_reactivation — dormant-account reactivation screen
  (long inactivity gap followed by a high-value event).
- t_event_type_drift — event-type distribution drift between the
  early and late halves of the stream (ppm shares, integer-exact).

Determinism follows queries/_det.py house rules: integer fixed-point
everywhere, µs-integer time arithmetic, md5 for cross-engine hashing,
unique window tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import track_persist
from ..functions.similarity import MINHASH_PERMS, md5_long, minhash_signature
from ..functions.text import ws_tokens
from ..sources.parquet_io import read_table
from ._det import events_table
from .llmdata import _DD_NTOK, _dd_md5_long, _dd_minhash_cte
from .registry import query

# ---------------------------------------------------------------------------
# x_cross_corpus_dedup — decontamination against a benchmark corpus
# ---------------------------------------------------------------------------

# Benchmark slice: every 29th doc plays the held-out eval corpus. In
# deployment this is the benchmark suite the train set must not leak
# (HellaSwag/MMLU/...): BOUNDED BY CONSTRUCTION — eval suites are
# thousands of docs against a 100 TB train corpus, which is what makes
# the broadcast below safe where the self-join LSH path must shuffle.
_XCCD_MOD = 29
_XCCD_MIN_MATCH = 8  # of 16 minhash components ≈ Jaccard ≥ 0.5


def _dd_xccd_sql() -> str:
    bands, r = 4, MINHASH_PERMS // 4
    band_defs = ",\n  ".join(
        "("
        + " || '-' || ".join(f"CAST(sig_{b * r + i} AS VARCHAR)" for i in range(r))
        + f") AS band_{b}"
        for b in range(bands)
    )
    or_cond = " OR ".join(f"t.band_{b} = b.band_{b}" for b in range(bands))
    match_sum = " + ".join(
        f"(CASE WHEN t.sig_{j} = b.sig_{j} THEN 1 ELSE 0 END)"
        for j in range(MINHASH_PERMS)
    )
    sig_cols = ", ".join(f"sig_{j}" for j in range(MINHASH_PERMS))
    return f"""
WITH {_dd_minhash_cte()},
banded AS (SELECT doc_id, {sig_cols},
  {band_defs}
FROM sig),
bench AS (SELECT * FROM banded WHERE doc_id % {_XCCD_MOD} = 0),
train AS (SELECT * FROM banded WHERE doc_id % {_XCCD_MOD} <> 0),
near AS (
  SELECT DISTINCT t.doc_id
  FROM train t JOIN bench b ON ({or_cond})
  WHERE {match_sum} >= {_XCCD_MIN_MATCH}
),
ex AS (
  SELECT DISTINCT d.doc_id
  FROM documents d JOIN documents e
    ON d.text = e.text AND e.doc_id % {_XCCD_MOD} = 0
  WHERE d.doc_id % {_XCCD_MOD} <> 0
)
SELECT d.doc_id,
  CAST(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS exact_dup,
  CAST(CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS near_dup,
  CAST(CASE WHEN ex.doc_id IS NULL AND nr.doc_id IS NULL THEN 1 ELSE 0 END
       AS BIGINT) AS keep
FROM documents d
LEFT JOIN ex ON d.doc_id = ex.doc_id
LEFT JOIN near nr ON d.doc_id = nr.doc_id
WHERE d.doc_id % {_XCCD_MOD} <> 0
"""


@query(
    "x_cross_corpus_dedup",
    _dd_xccd_sql(),
    bench=True,
    doc=(
        "Train-vs-benchmark decontamination: drop/flag train docs that "
        "exactly or nearly duplicate a held-out eval doc. The benchmark "
        "side is bounded by construction (an eval suite vs a 100 TB "
        "train corpus), so its banded MinHash keys and wide signatures "
        "BROADCAST — the train side streams through one map-side band "
        "probe + one semi-join, no train-side self-join and no shuffle "
        "of the train corpus beyond the signature groupBy. Near bar: "
        ">=8/16 matching components (est. Jaccard >= 0.5); exact bar: "
        "byte-identical text. exact_dup implies near_dup (identical "
        "text => identical signature)."
    ),
)
def x_cross_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % _XCCD_MOD == 0
    sig = track_persist(minhash_signature(d, "doc_id", "text", k=3))
    bsig = sig.filter(F.col("doc_id") % _XCCD_MOD == 0)
    tsig = sig.filter(F.col("doc_id") % _XCCD_MOD != 0)

    # The bench side broadcasts, so the band probe is MAP-SIDE — the
    # train signatures can ride through it wholesale (the "ids-only
    # band join" rule exists to keep wide rows off a SHUFFLED bucket
    # join; there is no shuffle here). Bench bands carry their full
    # signatures too (|bench| × bands rows, bounded), so the >=8/16
    # refine happens inside the same broadcast join and the only
    # train-side exchanges are the signature groupBy, one distinct on
    # matched ids, and the final flag join.
    def _wide_bands(s: DataFrame, prefix: str = "") -> DataFrame:
        r = MINHASH_PERMS // 4
        entries = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.concat_ws(
                        "-", *[F.col(f"sig_{b * r + i}") for i in range(r)]
                    ).alias("band_key"),
                )
                for b in range(4)
            ]
        )
        out = s.select(
            "doc_id",
            *[
                F.col(f"sig_{j}").alias(f"{prefix}sig_{j}")
                for j in range(MINHASH_PERMS)
            ],
            F.explode(entries).alias("band"),
        )
        return out.select(
            "doc_id",
            *[f"{prefix}sig_{j}" for j in range(MINHASH_PERMS)],
            F.col("band.band_idx").alias("band_idx"),
            F.col("band.band_key").alias("band_key"),
        )

    bband = _wide_bands(bsig, "b_").withColumnRenamed("doc_id", "bench_id")
    tband = _wide_bands(tsig)
    matches = sum(
        (F.col(f"sig_{j}") == F.col(f"b_sig_{j}")).cast("int")
        for j in range(MINHASH_PERMS)
    )
    near = (
        tband.join(F.broadcast(bband), ["band_idx", "band_key"])
        .filter(matches >= _XCCD_MIN_MATCH)
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(0).alias("__exact"), F.lit(1).alias("__near"))
    )
    bench_texts = F.broadcast(d.filter(is_bench).select("text").distinct())
    exact = (
        d.filter(~is_bench)
        .join(bench_texts, "text", "left_semi")
        .select("doc_id", F.lit(1).alias("__exact"), F.lit(0).alias("__near"))
    )
    flags = (
        near.unionByName(exact)
        .groupBy("doc_id")
        .agg(F.max("__exact").alias("__exact"), F.max("__near").alias("__near"))
    )
    return (
        d.filter(~is_bench)
        .select("doc_id")
        .join(flags, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__exact"), F.lit(0)).cast("bigint").alias("exact_dup"),
            F.coalesce(F.col("__near"), F.lit(0)).cast("bigint").alias("near_dup"),
            (
                F.coalesce(F.col("__exact"), F.lit(0))
                + F.coalesce(F.col("__near"), F.lit(0))
                == 0
            )
            .cast("bigint")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# x_curriculum_order — exact global curriculum rank without a global sort
# ---------------------------------------------------------------------------

# Cell = (difficulty value, contiguous doc_id range). The global order
# (difficulty, doc_id) restricted to a cell is just doc_id order, so
# pos = (# rows in earlier cells) + rank-within-cell. The range width
# ADAPTS to the id span (width = max(64, span/128)) so the cell table
# stays metadata-sized at any corpus size — a fixed width made the
# cell table corpus-sized at the local sf10 (90.7 s for 500 k docs;
# adaptive: the cumsum window sees <= 128 x |difficulty values| rows).
# Width only changes the construction, never the result: the property
# test pins equality with the naive global ROW_NUMBER at every width.
_XCUR_RANGE = 64  # minimum id-range width
_XCUR_MAX_RANGES = 128  # id-span divisor: at most this many ranges


def _dd_xcur_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, CAST({_DD_NTOK} AS BIGINT) AS difficulty FROM documents
),
r AS (
  SELECT doc_id, difficulty,
         ROW_NUMBER() OVER (ORDER BY difficulty, doc_id) AS pos,
         COUNT(*) OVER () AS total
  FROM t
)
SELECT doc_id, difficulty, CAST(pos AS BIGINT) AS pos,
       CAST(((pos - 1) * 4) // total AS BIGINT) AS phase
FROM r
"""


@query(
    "x_curriculum_order",
    _dd_xcur_sql(),
    doc=(
        "Curriculum ordering: exact global position by (difficulty = "
        "token count, doc_id) and a 4-phase assignment, computed "
        "WITHOUT a global sort. Cells are (difficulty, doc_id-range); "
        "per-cell counts cumsum on the metadata-sized cell table (the "
        "only single-partition window, bounded at corpus/cell_size "
        "rows), then each cell ranks internally under a cell-"
        "partitioned window and adds its offset. The oracle states the "
        "same thing as the naive ROW_NUMBER() OVER (ORDER BY ...)."
    ),
)
def x_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    span = d.agg(F.max("doc_id").alias("__max_id"))  # one-row broadcast
    t = (
        d.crossJoin(F.broadcast(span))
        .select(
            "doc_id",
            F.size(ws_tokens("text")).cast("bigint").alias("difficulty"),
            F.expr(
                f"doc_id div greatest({_XCUR_RANGE},"
                f" (__max_id + 1) div {_XCUR_MAX_RANGES})"
            ).alias("rng"),
        )
    )
    cells = t.groupBy("difficulty", "rng").agg(F.count(F.lit(1)).alias("n"))
    w_cells = (
        Window.orderBy("difficulty", "rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cells.select(
        "difficulty",
        "rng",
        F.coalesce(F.sum("n").over(w_cells), F.lit(0)).alias("base"),
    )
    total = cells.agg(F.sum("n").cast("bigint").alias("total"))
    w_cell = Window.partitionBy("difficulty", "rng").orderBy("doc_id")
    return (
        t.join(offs, ["difficulty", "rng"])
        .withColumn("pos", (F.col("base") + F.row_number().over(w_cell)).cast("bigint"))
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "difficulty",
            "pos",
            F.expr("((pos - 1) * 4) div total").cast("bigint").alias("phase"),
        )
    )


# ---------------------------------------------------------------------------
# x_dataset_manifest — per-shard export manifests
# ---------------------------------------------------------------------------

_XMAN_SHARDS = 16


def _dd_xman_sql() -> str:
    shard = (
        f"{_dd_md5_long(f'''('shard-v1:' || CAST(doc_id AS VARCHAR))''', 7)}"
        f" % {_XMAN_SHARDS}"
    )
    return f"""
SELECT CAST({shard} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM({_DD_NTOK}) AS BIGINT) AS sum_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       CAST(SUM({_dd_md5_long('text', 7)}) AS BIGINT) AS content_sum
FROM documents
GROUP BY 1
"""


@query(
    "x_dataset_manifest",
    _dd_xman_sql(),
    doc=(
        "Export manifest: md5-sharded corpus stats for training-data "
        "delivery — doc/char/token counts, lang/source cardinalities, "
        "id range, and an order-independent content checksum (SUM of "
        "per-doc md5 28-bit prefixes: commutative, so partition order "
        "never matters, and 2^28 per doc keeps the bigint sum exact to "
        "~2^34 docs per shard). One hash aggregate over the corpus; "
        "shard count scales with output file targets, not data."
    ),
)
def x_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    shard = (
        md5_long(F.concat(F.lit("shard-v1:"), F.col("doc_id").cast("string")), 7)
        % _XMAN_SHARDS
    )
    return (
        d.select(
            shard.cast("bigint").alias("shard"),
            "doc_id",
            "n_chars",
            "lang",
            "source",
            F.size(ws_tokens("text")).cast("bigint").alias("n_tokens"),
            md5_long(F.col("text"), 7).alias("content_h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("content_h").cast("bigint").alias("content_sum"),
        )
    )


# ---------------------------------------------------------------------------
# x_length_bucket_batching — length-banded dynamic batching
# ---------------------------------------------------------------------------

_XLBB_BAND = 16  # tokens per length band
_XLBB_MAX_BUCKET = 5
_XLBB_SHARDS = 8  # fixture; 256+ at deployment
_XLBB_BATCH = 8


def _dd_xlbb_sql() -> str:
    shard = (
        f"{_dd_md5_long(f'''('batch-v1:' || CAST(doc_id AS VARCHAR))''', 7)}"
        f" % {_XLBB_SHARDS}"
    )
    return f"""
WITH t AS (
  SELECT doc_id, CAST({_DD_NTOK} AS BIGINT) AS n_tokens,
         CAST({shard} AS BIGINT) AS shard
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens, shard,
         least(n_tokens // {_XLBB_BAND}, {_XLBB_MAX_BUCKET}) AS bucket
  FROM t
),
w AS (
  SELECT bucket, shard, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY bucket, shard
                            ORDER BY n_tokens, doc_id) - 1 AS rn
  FROM r
)
SELECT CAST(bucket AS BIGINT) AS bucket, shard,
       CAST(rn // {_XLBB_BATCH} AS BIGINT) AS batch_idx,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_tokens) AS BIGINT) AS min_len,
       CAST(MAX(n_tokens) AS BIGINT) AS max_len,
       CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS pad_waste
FROM w
GROUP BY bucket, shard, rn // {_XLBB_BATCH}
"""


@query(
    "x_length_bucket_batching",
    _dd_xlbb_sql(),
    doc=(
        "Dynamic batching for training: docs are banded by token "
        "length, md5-sharded, and batched within (band, shard) in "
        "(length, doc_id) order; per-batch padding waste = "
        "n*max_len - sum_len quantifies the bucketing win. Batching "
        "needs homogeneity, not a global order, so the windows "
        "partition by (band, shard) — shard count scales with the "
        "cluster, never a single-partition window over the corpus. "
        "Deterministic: md5 sharding + unique (length, doc_id) order."
    ),
)
def x_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    shard = (
        md5_long(F.concat(F.lit("batch-v1:"), F.col("doc_id").cast("string")), 7)
        % _XLBB_SHARDS
    )
    t = d.select(
        "doc_id",
        F.size(ws_tokens("text")).cast("bigint").alias("n_tokens"),
        shard.cast("bigint").alias("shard"),
    ).withColumn(
        "bucket",
        F.least(
            F.expr(f"n_tokens div {_XLBB_BAND}"), F.lit(_XLBB_MAX_BUCKET)
        ).cast("bigint"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("n_tokens", "doc_id")
    return (
        t.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("batch_idx", F.expr(f"rn div {_XLBB_BATCH}").cast("bigint"))
        .groupBy("bucket", "shard", "batch_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_len"),
            F.max("n_tokens").cast("bigint").alias("max_len"),
            (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens"))
            .cast("bigint")
            .alias("pad_waste"),
        )
    )


# ---------------------------------------------------------------------------
# a_dormant_reactivation — dormancy gap + high-value event screen
# ---------------------------------------------------------------------------

_ADR_GAP_US = 36 * 3600 * 1_000_000  # 36 h of silence
_ADR_MIN_CENTS = 10_000  # then a >= $100.00 event

_ADR_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS us
  FROM events
),
g AS (
  SELECT *, us - lag(us) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS gap_us
  FROM e
)
SELECT event_id, user_id, event_type, cents, CAST(gap_us AS BIGINT) AS gap_us
FROM g
WHERE gap_us >= {_ADR_GAP_US} AND cents >= {_ADR_MIN_CENTS}
"""


@query(
    "a_dormant_reactivation",
    _ADR_SQL,
    doc=(
        "Dormant-account reactivation screen (AML pattern: long-idle "
        "account suddenly moves real money): per-user lag over event "
        "time gives the silence gap before each event; flag gaps >= "
        "36 h whose event is >= $100. One user-partitioned window over "
        "µs integers (no date arithmetic, no floats: cents compare as "
        "exact integers), unique (us, event_id) order."
    ),
)
def a_dormant_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        e.withColumn("gap_us", (F.col("us") - F.lag("us").over(w)).cast("bigint"))
        .filter(
            (F.col("gap_us") >= _ADR_GAP_US) & (F.col("cents") >= _ADR_MIN_CENTS)
        )
        .select("event_id", "user_id", "event_type", "cents", "gap_us")
    )


# ---------------------------------------------------------------------------
# t_event_type_drift — early/late distribution drift monitor
# ---------------------------------------------------------------------------

_TDRIFT_SQL = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
e AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) * 2 <= lo + hi THEN 0 ELSE 1 END AS late
  FROM events, b
),
c AS (
  SELECT event_type,
         SUM(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS n_early,
         SUM(late) AS n_late
  FROM e GROUP BY event_type
),
t AS (SELECT SUM(n_early) AS te, SUM(n_late) AS tl FROM c)
SELECT event_type,
       CAST(n_early AS BIGINT) AS n_early,
       CAST(n_late AS BIGINT) AS n_late,
       CAST(CASE WHEN te = 0 THEN 0 ELSE (1000000 * n_early) // te END
            AS BIGINT) AS share_early_ppm,
       CAST(CASE WHEN tl = 0 THEN 0 ELSE (1000000 * n_late) // tl END
            AS BIGINT) AS share_late_ppm,
       CAST(abs(CASE WHEN te = 0 THEN 0 ELSE (1000000 * n_early) // te END
              - CASE WHEN tl = 0 THEN 0 ELSE (1000000 * n_late) // tl END)
            AS BIGINT) AS drift_ppm
FROM c, t
"""


@query(
    "t_event_type_drift",
    _TDRIFT_SQL,
    doc=(
        "Schema-free distribution drift: event-type shares in the "
        "early vs late half of the stream's time range (midpoint of "
        "the µs epoch extremes), reported in exact integer ppm with "
        "the absolute per-type drift. Two scalar aggregates broadcast "
        "(one row each); the corpus sees one hash agg keyed by "
        "event_type. The monitoring twin of the reference's dbt test "
        "layer, here as data rather than an assertion."
    ),
)
def t_event_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    e = ev.select("event_type", F.unix_micros(F.col("ts")).alias("us"))
    b = e.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    c = (
        e.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            (F.col("us") * 2 <= F.col("lo") + F.col("hi")).cast("int").alias("early"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("early").alias("n_early"),
            F.sum(1 - F.col("early")).alias("n_late"),
        )
    )
    t = c.agg(F.sum("n_early").alias("te"), F.sum("n_late").alias("tl"))
    # guard the degenerate single-timestamp stream: every event lands in
    # the early half, tl = 0, and integer division must yield 0 on both
    # engines (DuckDB errors on x // 0 where Spark `div` returns NULL)
    se = "CASE WHEN te = 0 THEN 0 ELSE (1000000 * n_early) div te END"
    sl = "CASE WHEN tl = 0 THEN 0 ELSE (1000000 * n_late) div tl END"
    return c.crossJoin(F.broadcast(t)).select(
        "event_type",
        F.col("n_early").cast("bigint").alias("n_early"),
        F.col("n_late").cast("bigint").alias("n_late"),
        F.expr(se).cast("bigint").alias("share_early_ppm"),
        F.expr(sl).cast("bigint").alias("share_late_ppm"),
        F.expr(f"abs(({se}) - ({sl}))").cast("bigint").alias("drift_ppm"),
    )


# ---------------------------------------------------------------------------
# x_bpe_apply — tokenize the corpus with the induced BPE merges
# ---------------------------------------------------------------------------


def _dd_bpe_apply_sql() -> str:
    from .round6b import _BPE_MERGES, _dd_bpe_chain

    toks = "list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x <> '')"
    return f"""
WITH {_dd_bpe_chain()},
dtok AS (
  SELECT doc_id, unnest({toks}) AS token FROM documents
),
j AS (
  SELECT doc_id, CAST(len(string_split(s{_BPE_MERGES}.seq, '  ')) AS BIGINT) AS n_sub
  FROM dtok JOIN s{_BPE_MERGES} USING (token)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
       CAST((100 * SUM(n_sub)) // COUNT(*) AS BIGINT) AS subwords_per_100w
FROM j GROUP BY doc_id
"""


@query(
    "x_bpe_apply",
    _dd_bpe_apply_sql(),
    doc=(
        "Corpus tokenization with the induced BPE merges: the "
        "induction loop's final state IS the tokenizer — a "
        "distinct-token table mapping each word to its subword "
        "sequence — so applying it corpus-wide is one vocab-keyed "
        "join (the exact-duplicate contraction again: merges never "
        "re-run per document, and a 100 TB corpus tokenizes through "
        "a vocab-sized lookup shuffled on the token key, never "
        "broadcast — heavy-tailed vocabularies outgrow broadcast). "
        "Per-doc subword fertility (subwords per 100 words) is the "
        "standard tokenizer-fit diagnostic, exact-integer div."
    ),
)
def x_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .round6b import _bpe_train

    _, seqs = _bpe_train(spark, sf_dir)
    vocab = seqs.select(
        "token", F.size(F.split(F.col("seq"), "  ")).cast("bigint").alias("n_sub")
    )
    d = read_table(spark, sf_dir, "documents")
    dtok = d.select(
        "doc_id", F.explode(F.transform(ws_tokens("text"), F.lower)).alias("token")
    )
    return (
        dtok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_subwords"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_subwords",
            F.expr("(100 * n_subwords) div n_words")
            .cast("bigint")
            .alias("subwords_per_100w"),
        )
    )


# ---------------------------------------------------------------------------
# w_event_rate_spike — hourly rate anomaly vs trailing per-user baseline
# ---------------------------------------------------------------------------

_WERS_TRAIL_H = 72  # trailing baseline window (hours, exclusive of current)
_WERS_FACTOR = 3  # spike = current-hour count >= 3x trailing hourly mean
_WERS_FLOOR = 3  # and at least this many events in the hour

_WERS_SQL = f"""
WITH h AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT user_id, hour_id, n,
         CAST(COALESCE(SUM(n) OVER tw, 0) AS BIGINT) AS trail_n,
         CAST(COUNT(n) OVER tw AS BIGINT) AS trail_hours
  FROM h
  WINDOW tw AS (PARTITION BY user_id ORDER BY hour_id
                RANGE BETWEEN {_WERS_TRAIL_H} PRECEDING AND 1 PRECEDING)
)
SELECT user_id, CAST(hour_id AS BIGINT) AS hour_id, n, trail_n, trail_hours
FROM w
WHERE trail_hours > 0
  AND n >= {_WERS_FLOOR}
  AND n * trail_hours >= {_WERS_FACTOR} * trail_n
"""


@query(
    "w_event_rate_spike",
    _WERS_SQL,
    doc=(
        "Hourly activity-rate anomaly: a user-hour spikes when its "
        "event count is >= 3x the user's trailing 72 h hourly mean "
        "(active hours only) and clears an absolute floor. One "
        "hash agg to user-hour grain, then one user-partitioned "
        "RANGE frame over integer hour ids — the comparison is "
        "cross-multiplied (n * trail_hours >= 3 * trail_n) so no "
        "division ever happens: exact integers end to end. The "
        "velocity-monitoring twin of the structuring screen (sum-"
        "based) — this one is rate-based."
    ),
)
def w_event_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    # floored hour bucket, exact integer arithmetic: Spark `div`
    # truncates toward zero while the oracle's `//` floors, so pre-1970
    # (negative-µs) timestamps would shift bucket boundaries — subtract
    # the pmod remainder first and the division is exact either way
    h = (
        ev.select(
            "user_id",
            F.expr(
                "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))"
                " div 3600000000"
            ).alias("hour_id"),
        )
        .groupBy("user_id", "hour_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tw = (
        Window.partitionBy("user_id")
        .orderBy("hour_id")
        .rangeBetween(-_WERS_TRAIL_H, -1)
    )
    w = h.select(
        "user_id",
        F.col("hour_id").cast("bigint").alias("hour_id"),
        "n",
        F.coalesce(F.sum("n").over(tw), F.lit(0)).cast("bigint").alias("trail_n"),
        F.count("n").over(tw).cast("bigint").alias("trail_hours"),
    )
    return w.filter(
        (F.col("trail_hours") > 0)
        & (F.col("n") >= _WERS_FLOOR)
        & (F.col("n") * F.col("trail_hours") >= _WERS_FACTOR * F.col("trail_n"))
    )
