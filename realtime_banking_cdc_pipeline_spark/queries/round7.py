"""Round-7 additions (reference analog: the dedup/quality stages its
Silver layer implies, `models/silver/*.sql`; the reference has no
substring-level dedup — this is the training-data-pipeline extension
the survey calls for):

- x_substring_dedup — exact repeated-substring removal at token
  granularity (Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better", arXiv:2107.06499): their ExactSubstr
  dedup removes any substring of >= 50 tokens that appears more than
  once in the corpus. The suffix-array construction is inherently
  sequential; the Spark-shaped equivalent is k-gram anchoring, which
  is EXACT for the "drop every token inside a repeated >= k-token
  window" contract: a substring of length >= k repeats iff it is
  covered by repeated k-grams (its every k-window repeats wherever it
  does), so the union of repeated-k-gram intervals IS the union of
  repeated >= k substrings. No suffix array, no driver state — one
  shingle explode, one count, one membership join, one per-doc
  interval-merge window.

Determinism: token positions and span bounds are exact integers;
k-grams compare by md5 (the cross-engine house hash) — both engines
group by the same digest, so even a collision (2^-64) would bind
identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_io import read_table
from .registry import query

# Anchor length (tokens). Production runs the paper's 50; the fixture
# corpus averages 54 tokens/doc, so the registered bar sits at 8 where
# the generator's sentence-level boilerplate actually repeats (1,015
# repeated 8-grams / 2,101 anchor positions at sf0.01 — real work).
_XSUB_K = 8

_XSUB_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), ' +'), x -> x <> '')"
)

_XSUB_SQL = f"""
WITH d AS (
  SELECT doc_id, {_XSUB_TOKS} AS toks FROM documents
),
ng AS (
  SELECT doc_id, u.p,
         md5(array_to_string(toks[u.p + 1 : u.p + {_XSUB_K}], ' ')) AS g
  FROM d, LATERAL unnest(generate_series(0, len(toks) - {_XSUB_K})) AS u(p)
  WHERE len(toks) >= {_XSUB_K}
),
rep AS (SELECT g FROM ng GROUP BY g HAVING COUNT(*) >= 2),
anchors AS (SELECT ng.doc_id, ng.p FROM ng JOIN rep USING (g)),
isl AS (
  SELECT doc_id, p,
         SUM(CASE WHEN prev IS NULL OR p - prev > {_XSUB_K} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT doc_id, p,
           LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
    FROM anchors
  )
)
SELECT doc_id,
       CAST(MIN(p) AS BIGINT) AS span_start,
       CAST(MAX(p) + {_XSUB_K} AS BIGINT) AS span_end,
       CAST(MAX(p) + {_XSUB_K} - MIN(p) AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_anchors
FROM isl GROUP BY doc_id, island
"""


@query(
    "x_substring_dedup",
    _XSUB_SQL,
    bench=True,
    doc=(
        "ExactSubstr dedup (arXiv:2107.06499) as k-gram anchoring: "
        "emit every k-token shingle with its position, count corpus-"
        "wide occurrences (map-side-combinable hash agg on the md5 "
        "digest — 16-byte keys, never the raw text), join positions "
        "of repeated shingles back, and merge overlapping/adjacent "
        "anchor intervals per doc into maximal repeated spans (gap-"
        "islands: same-length intervals merge iff the position gap "
        "is <= k, one doc-partitioned window). Exact for the drop-"
        "every-repeated->=k-window contract — a >= k-token substring "
        "repeats iff all its k-windows do, so the interval union "
        "equals the repeated-substring union; the sequential suffix "
        "array never materializes. Scale: shingles are linear in "
        "corpus tokens, the only wide exchange is the digest count + "
        "membership join, and the window is doc-partitioned (no "
        "global sort). Production bar = the paper's 50 tokens; the "
        "fixture registers k=8 against ~54-token docs."
    ),
)
def x_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), " +"), lambda t: t != ""
    )
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("toks")
    )
    ng = (
        d.filter(F.size("toks") >= _XSUB_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {_XSUB_K}),"
                    f" p -> struct(p AS p,"
                    f" md5(array_join(slice(toks, p + 1, {_XSUB_K}), ' ')) AS g))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.p").alias("p"), F.col("s.g").alias("g"))
    )
    rep = ng.groupBy("g").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") >= 2
    )
    # rep is one row per repeated shingle (unbounded) — no broadcast hint
    anchors = ng.join(rep.select("g"), "g").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = (
        anchors.withColumn("prev", F.lag("p").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("p") - F.col("prev") > _XSUB_K),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "island",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("p").cast("bigint").alias("span_start"),
        (F.max("p") + _XSUB_K).cast("bigint").alias("span_end"),
        (F.max("p") + _XSUB_K - F.min("p")).cast("bigint").alias("span_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
    ).drop("island").select(
        "doc_id", "span_start", "span_end", "span_tokens", "n_anchors"
    )
