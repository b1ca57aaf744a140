"""Round-12 queries: corpus-composition analytics — coverage curves,
source-novelty attribution, embedding-cell-balanced subset selection,
the per-source dedup impact report, the MinHash estimator calibration
curve, and label-propagation communities over the match graph.

Reference parity: the reference repo's analytics tier has no corpus
operators (its compute is dbt SQL over banking CDC rows — SURVEY.md
§2.9); this module continues the LLM-data-pipeline extension mandated
by the build brief. The shapes here are the curation DECISION layer on
top of the existing dedup/quality machinery: which sources add novel
content, how much of the corpus a prefix covers, and how to draw a
cluster-balanced subset — all scan + hash-agg shaped, no driver state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet_io import read_table
from .registry import query
from .llmdata import _DD_TOKS, _DD_NTOK, _dd_shingles

_COV_K = 3  # shingle order shared with x_ngram_novelty
# contiguous doc_id ranges (NOT modulo) so shard order == doc order;
# width 4096 keeps the shard-offset frame at N/4096 rows — the only
# single-partition window in the query runs over THAT frame, never
# over the docs themselves (x_pack_sequences' shard-running-sum rule).
_COV_SHARD_W = 4096

_COV_SQL = f"""
WITH toks AS (SELECT doc_id, {_DD_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_dd_shingles(_COV_K)}) AS shingle FROM toks),
first AS (SELECT shingle, MIN(doc_id) AS doc_id FROM sh GROUP BY shingle),
intro AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
          FROM first GROUP BY doc_id),
base AS (SELECT d.doc_id, COALESCE(i.n_new, 0) AS n_new
         FROM documents d LEFT JOIN intro i USING (doc_id)),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM first)
SELECT base.doc_id,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(SUM(n_new) OVER (ORDER BY base.doc_id) AS BIGINT) AS cum_new,
       CAST(CAST(SUM(n_new) OVER (ORDER BY base.doc_id) AS DOUBLE)
            / CAST(total AS DOUBLE) AS DOUBLE) AS coverage
FROM base, tot
"""


@query(
    "x_ngram_coverage_curve",
    _COV_SQL,
    bench=True,
    doc=(
        "Corpus coverage curve in arrival (doc_id) order: per doc, the "
        "number of distinct 3-gram shingles it is the FIRST to "
        "introduce (global min-doc_id ownership), the running total, "
        "and the fraction of the corpus' full shingle vocabulary a "
        "prefix ending at that doc covers — the data-value / dedup-"
        "saturation curve a curation pipeline reads to decide when "
        "additional crawl mass stops adding content (the flattening "
        "knee). Scale: one shingle fan-out (the shared sketch-op "
        "multiplier), two hash aggs, then a TWO-LEVEL prefix sum — "
        "within contiguous 4096-doc shards via a partitioned window, "
        "shard offsets via a window over the N/4096-row shard-total "
        "frame; no window ever orders the full doc set in one "
        "partition. The vocabulary size rides along as a broadcast "
        "one-row scalar."
    ),
)
def x_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from ..functions.similarity import exploded_shingles

    d = read_table(spark, sf_dir, "documents")
    sh = exploded_shingles(d, "doc_id", "text", _COV_K)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("doc_id"))
    intro = first.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    # persist the doc-sized base: the shard totals, the scalar
    # vocabulary size, AND the final projection all read it — without
    # this the shingle fan-out (the expensive subtree) evaluates three
    # times. Every shingle is introduced exactly once, so the
    # vocabulary size is just sum(n_new) over base — no third scan.
    base = track_persist(
        d.select("doc_id")
        .join(intro, "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
            (F.col("doc_id") / _COV_SHARD_W).cast("bigint").alias("__shard"),
        )
    )
    within = F.sum("n_new").over(
        Window.partitionBy("__shard").orderBy("doc_id")
    )
    shard_tot = base.groupBy("__shard").agg(
        F.sum("n_new").cast("bigint").alias("__t")
    )
    offset = shard_tot.select(
        "__shard",
        (
            F.sum("__t").over(Window.orderBy("__shard")) - F.col("__t")
        ).alias("__off"),
    )
    total = base.agg(F.sum("n_new").cast("bigint").alias("__total"))
    return (
        base.join(offset, "__shard")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_new",
            (F.col("__off") + within).cast("bigint").alias("cum_new"),
            (
                (F.col("__off") + within).cast("double")
                / F.col("__total").cast("double")
            ).alias("coverage"),
        )
    )


_SRCNOV_SQL = f"""
WITH toks AS (SELECT doc_id, source, {_DD_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, source, unnest({_dd_shingles(_COV_K)}) AS shingle
       FROM toks),
first AS (SELECT shingle, MIN(doc_id) AS doc_id FROM sh GROUP BY shingle),
owned AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_owned
          FROM first f JOIN documents d USING (doc_id) GROUP BY d.source),
per_src AS (SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_occ,
                   CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct
            FROM sh GROUP BY source),
docs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY source),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM first)
SELECT d.source, n_docs, n_occ, n_distinct,
       COALESCE(n_owned, 0) AS n_owned,
       CAST(CAST(COALESCE(n_owned, 0) AS DOUBLE)
            / CAST(total AS DOUBLE) AS DOUBLE) AS owned_frac,
       CAST(1.0 - CAST(n_distinct AS DOUBLE)
            / CAST(n_occ AS DOUBLE) AS DOUBLE) AS redundancy
FROM docs d
JOIN per_src USING (source)
LEFT JOIN owned USING (source), tot
"""


@query(
    "x_source_novelty",
    _SRCNOV_SQL,
    doc=(
        "Source-novelty attribution — the data-mixing signal one level "
        "up from x_source_diversity's lexical profile: per source, how "
        "many of the corpus' distinct 3-gram shingles this source was "
        "the FIRST to introduce (ownership = global min-doc_id, i.e. "
        "the source would have contributed them even under keep-first "
        "dedup), its share of the full vocabulary, and its internal "
        "redundancy (1 - distinct/occurrences). Sources with high "
        "owned_frac and low redundancy are up-weight candidates; high-"
        "redundancy sources are dedup targets before mixing. Scale: "
        "the same shared shingle fan-out, then hash aggs keyed on "
        "shingle and source — the per-source distinct count is a two-"
        "key agg on (source, shingle) first, no count-distinct "
        "shuffle amplification."
    ),
)
def x_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from ..functions.similarity import _shingles_from_tokens
    from ..functions.text import ws_tokens

    d = read_table(spark, sf_dir, "documents")
    # carry source THROUGH the fan-out instead of joining the doc->
    # source map back onto the exploded shingles (at corpus scale that
    # map is not broadcast-able and the join would reshuffle the
    # multiplied rows); ownership re-attaches source via an equi-join
    # on doc_id against the SMALL first-introducer frame only
    toks = d.select(
        "doc_id", "source", ws_tokens("text").alias("__toks")
    )
    # the fan-out is read by both the ownership and the per-source
    # profile subtrees — persist it once (the paragraph_dedup_frame
    # convention for multiplied shingle frames)
    sh = track_persist(
        toks.select(
            "doc_id",
            "source",
            F.explode(_shingles_from_tokens(F.col("__toks"), _COV_K)).alias(
                "shingle"
            ),
        )
    )
    first = track_persist(
        sh.groupBy("shingle").agg(F.min("doc_id").alias("doc_id"))
    )
    owned = (
        first.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_owned"))
    )
    per_src = (
        sh.groupBy("source", "shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .groupBy("source")
        .agg(
            F.sum("__c").cast("bigint").alias("n_occ"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        )
    )
    docs = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    total = first.agg(F.count(F.lit(1)).cast("bigint").alias("__total"))
    return (
        docs.join(per_src, "source")
        .join(owned, "source", "left_outer")
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_occ",
            "n_distinct",
            F.coalesce(F.col("n_owned"), F.lit(0))
            .cast("bigint")
            .alias("n_owned"),
            (
                F.coalesce(F.col("n_owned"), F.lit(0)).cast("double")
                / F.col("__total").cast("double")
            ).alias("owned_frac"),
            (
                F.lit(1.0)
                - F.col("n_distinct").cast("double")
                / F.col("n_occ").cast("double")
            ).alias("redundancy"),
        )
    )


_CBS_K = 4  # kept rows per cell
_CBS_BITS = 8  # sign bits -> 256 cells
_CBS_SHARDS = 16  # phase-1 partial top-k fan

_CBS_CELL_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(_CBS_BITS)
)

_CBS_SQL = f"""
WITH c AS (SELECT vec_id, label,
                  CAST({_CBS_CELL_SQL} AS BIGINT) AS cell,
                  md5(CAST(vec_id AS VARCHAR)) AS k
           FROM embeddings),
r AS (SELECT cell, vec_id, label,
             CAST(ROW_NUMBER() OVER (PARTITION BY cell ORDER BY k, vec_id)
                  AS BIGINT) AS rk
      FROM c)
SELECT cell, rk, vec_id, label FROM r WHERE rk <= {_CBS_K}
"""


@query(
    "x_cluster_balanced_sample",
    _CBS_SQL,
    doc=(
        "Cluster-balanced subset selection: hash every embedding into "
        "one of 256 sign-bit cells (the sign of its first 8 "
        "components — a deterministic SimHash-style quantizer both "
        "engines can express) and keep at most 4 vectors per cell, "
        "ordered by (md5(vec_id), vec_id) — an unbiased-within-cell "
        "deterministic draw. The diversity-preserving complement of "
        "x_quality_stratified_trim (strata = semantic cells, not "
        "quality bands): a subset whose cell histogram is flat even "
        "when the corpus is wildly cluster-skewed. Scale: NO "
        "single-cell sort bottleneck — phase 1 takes the per-"
        "(cell, vec_id mod 16) partial top-4 (each window partition "
        "is 1/16th of a cell), phase 2 ranks the <= 64 survivors per "
        "cell; a billion-row skewed cell never passes through one "
        "task. Top-k-of-shard-top-ks == global top-k exactly."
    ),
)
def x_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return balanced_sample_frame(read_table(spark, sf_dir, "embeddings"))


def balanced_sample_frame(e: DataFrame) -> DataFrame:
    """The x_cluster_balanced_sample machinery over any (vec_id, label,
    embedding) frame — split out so the skewed-cell regime (a cell
    larger than the phase-1 prune threshold K*shards, which the small
    testdata never produces) is pin-able on synthetic frames."""
    cell = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col("embedding")[i] >= 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
            for i in range(_CBS_BITS)
        ],
    ).cast("bigint")
    c = e.select(
        "vec_id",
        "label",
        cell.alias("cell"),
        F.md5(F.col("vec_id").cast("string").cast("binary")).alias("__k"),
    )
    w1 = Window.partitionBy(
        "cell", F.pmod(F.col("vec_id"), F.lit(_CBS_SHARDS))
    ).orderBy("__k", "vec_id")
    phase1 = c.withColumn("__r1", F.row_number().over(w1)).filter(
        F.col("__r1") <= _CBS_K
    )
    w2 = Window.partitionBy("cell").orderBy("__k", "vec_id")
    return (
        phase1.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= _CBS_K)
        .select("cell", "rk", "vec_id", "label")
    )


_DSR_SQL = f"""
WITH t AS (SELECT doc_id, source, md5(text) AS g,
                  CAST({_DD_NTOK} AS BIGINT) AS n_tokens
           FROM documents),
keep AS (SELECT g, MIN(doc_id) AS keeper FROM t GROUP BY g)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN doc_id <> keeper THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_dup,
       CAST(CAST(SUM(CASE WHEN doc_id <> keeper THEN n_tokens ELSE 0 END)
                 AS DOUBLE)
            / CAST(SUM(n_tokens) AS DOUBLE) AS DOUBLE) AS dup_token_frac
FROM t JOIN keep USING (g)
GROUP BY source
"""


@query(
    "x_dedup_source_report",
    _DSR_SQL,
    doc=(
        "Per-source exact-dedup impact report — the audit table a "
        "curation run publishes next to its survivor set: docs and "
        "tokens per source, how many of each a keep-first exact dedup "
        "(md5(text) groups, min-doc_id keeper) would REMOVE, and the "
        "removed-token fraction. Removal is attributed to the source "
        "of the REMOVED doc (cross-source copies debit the copier, "
        "not the originator), so the report directly answers 'which "
        "feed is reposting content we already have'. Scale: one "
        "md5-contraction hash agg (the x_dedup_exact shape) + one "
        "broadcast-able join back on the 16-byte group key + one "
        "hash agg on source; integer token sums are exact, the "
        "fraction is a final double division."
    ),
)
def x_dedup_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from ..functions.text import ws_token_count

    d = read_table(spark, sf_dir, "documents")
    # both the keeper contraction and the attribution join read the
    # digested frame; persisting it keeps the text scan + md5 single
    t = track_persist(
        d.select(
            "doc_id",
            "source",
            F.md5(F.col("text").cast("binary")).alias("g"),
            ws_token_count("text").cast("bigint").alias("n_tokens"),
        )
    )
    keep = t.groupBy("g").agg(F.min("doc_id").alias("keeper"))
    dup_tok = F.when(
        F.col("doc_id") != F.col("keeper"), F.col("n_tokens")
    ).otherwise(F.lit(0))
    return (
        t.join(keep, "g")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dup_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.sum(dup_tok).cast("bigint").alias("tokens_dup"),
            (
                F.sum(dup_tok).cast("double")
                / F.sum("n_tokens").cast("double")
            ).alias("dup_token_frac"),
        )
    )


# ---------------------------------------------------------------------------
# x_minhash_calibration — estimator bias curve of the MinHash Jaccard
# estimate, per matching-component bucket
# ---------------------------------------------------------------------------

def _dd_mhcal_sql() -> str:
    from .llmdata import _dd_minhash_cte
    from ..functions.similarity import MINHASH_PERMS

    bands, r = 4, MINHASH_PERMS // 4
    band_defs = ",\n  ".join(
        "("
        + " || '-' || ".join(
            f"CAST(sig_{b * r + i} AS VARCHAR)" for i in range(r)
        )
        + f") AS band_{b}"
        for b in range(bands)
    )
    or_cond = " OR ".join(f"a.band_{b} = b.band_{b}" for b in range(bands))
    match_sum = " + ".join(
        f"(CASE WHEN a.sig_{j} = b.sig_{j} THEN 1 ELSE 0 END)"
        for j in range(MINHASH_PERMS)
    )
    return f"""
WITH {_dd_minhash_cte()},
banded AS (SELECT doc_id,
  {", ".join(f"sig_{j}" for j in range(MINHASH_PERMS))},
  {band_defs}
FROM sig),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST({match_sum} AS BIGINT) AS n_matching
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id AND ({or_cond})
),
sh3 AS (SELECT doc_id, unnest({_dd_shingles(3)}) AS shingle FROM toks),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM sh3 GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cand c
  JOIN sh3 a ON a.doc_id = c.id_a
  JOIN sh3 b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
scored AS (
  SELECT c.n_matching,
         COALESCE(m.n_common, 0) AS inter,
         sa.n + sb.n - COALESCE(m.n_common, 0) AS uni
  FROM cand c
  LEFT JOIN common m ON m.id_a = c.id_a AND m.id_b = c.id_b
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
)
SELECT n_matching,
       CAST(CAST(n_matching AS DOUBLE) / {MINHASH_PERMS}.0 AS DOUBLE)
         AS est_jaccard,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(inter) AS BIGINT) AS sum_inter,
       CAST(SUM(uni) AS BIGINT) AS sum_union,
       CAST(CAST(SUM(inter) AS DOUBLE) / CAST(SUM(uni) AS DOUBLE) AS DOUBLE)
         AS exact_jaccard
FROM scored GROUP BY n_matching
"""


@query(
    "x_minhash_calibration",
    _dd_mhcal_sql(),
    doc=(
        "MinHash estimator calibration curve — the bias report that "
        "completes the estimator-eval family (x_lsh_dedup_eval is "
        "threshold precision/recall, x_cms_calibration the counting "
        "twin): banded-LSH candidate pairs bucketed by their "
        "matching-component count (the 16-perm Jaccard estimate), "
        "each bucket reporting exact 3-gram Jaccard as a RATIO OF "
        "INTEGER SUMS (sum intersections / sum unions — order-free, "
        "unlike a mean of per-pair doubles) against the bucket's "
        "est_jaccard = n_matching/16. E[match] = J per permutation, "
        "so a healthy estimator puts exact_jaccard near est_jaccard "
        "in every populated bucket. Scale: candidates only (banding "
        "bounds pairs), per-pair intersections via the candidate-"
        "restricted shingle join — never an all-pairs pass; the "
        "output is <= 17 rows."
    ),
)
def x_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist
    from ..functions.similarity import (
        MINHASH_PERMS,
        exploded_shingles,
        lsh_band_pairs,
        minhash_signature,
    )

    d = read_table(spark, sf_dir, "documents")
    sig = minhash_signature(d, "doc_id", "text", k=3)
    cand = track_persist(
        lsh_band_pairs(sig, "doc_id", MINHASH_PERMS, bands=4).select(
            "id_a", "id_b", F.col("n_matching").cast("bigint").alias("n_matching")
        )
    )
    sh3 = track_persist(exploded_shingles(d, "doc_id", "text", 3))
    sizes = sh3.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    common = (
        cand.join(sh3.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(
            sh3.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    scored = (
        cand.join(common, ["id_a", "id_b"], "left_outer")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "n_matching",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("inter"),
            (
                F.col("na") + F.col("nb")
                - F.coalesce(F.col("n_common"), F.lit(0))
            ).alias("uni"),
        )
    )
    return scored.groupBy("n_matching").agg(
        (F.first("n_matching").cast("double") / F.lit(float(MINHASH_PERMS)))
        .alias("est_jaccard"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("inter").cast("bigint").alias("sum_inter"),
        F.sum("uni").cast("bigint").alias("sum_union"),
        (
            F.sum("inter").cast("double") / F.sum("uni").cast("double")
        ).alias("exact_jaccard"),
    )


# ---------------------------------------------------------------------------
# x_label_propagation — synchronous LPA communities over the winnowing
# match graph
# ---------------------------------------------------------------------------

_LPA_ITERS = 4


def _dd_lpa_sql(iters: int = _LPA_ITERS) -> str:
    from .round7 import _XWIN_SQL
    from .round7b import _WMATCH_DF_CAP, _WMATCH_MIN

    head = f"""
WITH w AS ({_XWIN_SQL}),
fp_docs AS (SELECT DISTINCT doc_id, fp FROM w),
df AS (SELECT fp, COUNT(*) AS n_docs FROM fp_docs GROUP BY fp),
elig AS (SELECT fp FROM df WHERE n_docs BETWEEN 2 AND {_WMATCH_DF_CAP}),
p0 AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp_docs a
  JOIN fp_docs b ON a.fp = b.fp AND a.doc_id < b.doc_id
  JOIN elig ON elig.fp = a.fp
),
wm AS (SELECT id_a, id_b FROM p0
       GROUP BY id_a, id_b HAVING COUNT(*) >= {_WMATCH_MIN}),
edges AS (SELECT id_a AS src, id_b AS dst FROM wm
          UNION ALL SELECT id_b, id_a FROM wm),
l0 AS (SELECT doc_id AS id, doc_id AS lbl FROM documents)"""
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f""",
v{t} AS (SELECT e.src AS id, l.lbl, COUNT(*) AS c
         FROM edges e JOIN l{t - 1} l ON l.id = e.dst GROUP BY 1, 2),
b{t} AS (SELECT id, lbl FROM (
           SELECT id, lbl,
                  ROW_NUMBER() OVER (PARTITION BY id
                                     ORDER BY c DESC, lbl ASC) AS rn
           FROM v{t}) t WHERE rn = 1),
l{t} AS (SELECT p.id, COALESCE(b.lbl, p.lbl) AS lbl
         FROM l{t - 1} p LEFT JOIN b{t} b ON b.id = p.id)""")
    return (
        head
        + "".join(rounds)
        + f"""
SELECT id AS doc_id, lbl AS community,
       CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
FROM l{iters}
"""
    )


@query(
    "x_label_propagation",
    _dd_lpa_sql(),
    bench=True,
    doc=(
        "Synchronous label-propagation communities (Raghavan et al. "
        "2007) over the MOSS winnowing match graph — community "
        "detection beyond the connected-components family: each of 4 "
        "fixed rounds every node adopts the most frequent label among "
        "its neighbors (ties broken by smaller label; isolated nodes "
        "keep their own id). Fixed iteration count + total tiebreak "
        "makes sync LPA fully deterministic (including on "
        "oscillation-prone bipartite structures, where it simply "
        "reports round-4 labels). Scale: per round one equi-join on "
        "the edge list + one (node,label) hash agg + one per-NODE "
        "window (argmax over that node's labels, never a global "
        "sort) + one left join; edges are bounded by the winnowing "
        "df-cap (<= 64 docs/fingerprint). Final community sizes come "
        "from a groupBy count + equi-join, never a label-partitioned "
        "window — a giant community must not flow through one task. "
        "The oracle unrolls the 4 rounds as CTEs (the x_pagerank "
        "convention)."
    ),
)
def x_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import CheckpointScope, promote_scope, track_persist
    from .round7b import x_winnowing_matches

    d = read_table(spark, sf_dir, "documents")
    wm = x_winnowing_matches(spark, sf_dir).select("id_a", "id_b")
    edges = track_persist(
        wm.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(
            wm.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
    )
    labels = d.select(
        F.col("doc_id").alias("id"), F.col("doc_id").alias("lbl")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("c").desc(), F.col("lbl").asc()
    )
    # Per-round CheckpointScope (r17, r16 verdict #2): once round i's
    # frame materializes, round i-1's checkpoint has no reader left —
    # free it inside the loop so live executor storage stays O(|V|),
    # not O(rounds × |V|). The final round's checkpoint backs the
    # returned frame, so it is promoted to the global registry for the
    # host's release_caches().
    cur = CheckpointScope()
    for _ in range(_LPA_ITERS):
        votes = (
            edges.join(
                labels.select(F.col("id").alias("dst"), "lbl"), "dst"
            )
            .groupBy(F.col("src").alias("id"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("lbl").alias("new_lbl"))
        )
        # Eager checkpoint, not persist: each round references the
        # previous labels twice (votes join + carry-forward join), so a
        # persist-only loop doubles the LOGICAL plan per round — 2^4
        # copies of the winnowing subtree, a 1.3 MB formatted plan that
        # Catalyst re-analyzes on every run (~2 s driver time at sf0.1,
        # plans/r16/x_label_propagation_*.txt). Checkpointing truncates
        # lineage so the plan stays linear in rounds; row values are
        # identical.
        nxt = CheckpointScope()
        labels = nxt.ckpt(
            labels.join(best, "id", "left_outer").select(
                "id",
                F.coalesce(F.col("new_lbl"), F.col("lbl")).alias("lbl"),
            )
        )
        cur.release()  # round i-1's checkpoint: this round materialized
        cur = nxt
    promote_scope(cur)  # round-4 labels back the returned frame
    # Community sizes via groupBy + equi-join (the a6_argmax_latest
    # convention), NOT count().over(Window.partitionBy("lbl")): a giant
    # near-dup community would flow through ONE task under a label
    # window, while groupBy gets map-side partial aggregation and the
    # rejoin is AQE-skew-splittable. `labels` is persisted above, so
    # both sides of the join read the cached round-4 frame.
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("community_size")
    )
    return labels.join(sizes, "lbl").select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("community"),
        "community_size",
    )
