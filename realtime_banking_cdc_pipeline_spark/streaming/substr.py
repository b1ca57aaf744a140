"""Incremental ExactSubstr anchoring: the streaming form of
``queries/round7.py:x_substring_dedup``.

Batch ExactSubstr needs the whole corpus to know which k-grams repeat.
Online, documents arrive continuously and repetition is RETROACTIVE: a
gram first seen in epoch 3 that repeats in epoch 7 makes the epoch-3
position boilerplate only at epoch 7. The store therefore keeps two
epoch-partitioned tables (the corpus.py exactly-once pattern — each
epoch owns its partition, replays overwrite):

- gram counts   (g, cnt)          — per-batch occurrence counts
- gram positions (g, doc_id, p)   — the batch's anchor-candidate sites

Each micro-batch emits every anchor whose flagged-status is decided BY
this batch, exactly once:

  newly repeated  cnt_hist < 2 and cnt_hist + cnt_batch >= 2
      -> ALL positions of g (historical + batch) emit now
  already repeated  cnt_hist >= 2
      -> only the batch's new positions emit (history already emitted)

The union of per-epoch emissions over any batch partitioning — in any
arrival order, replays included — equals the batch-mode anchor set
exactly (pinned by tests/test_round7_properties.py). Span merging is
the same downstream `_merge_anchor_islands` pass over the accumulated
anchors.

At 100 TB: both stores are gram-keyed and land in
``bucket=pmod(xxhash64(g), 64)`` parquet partitions (the corpus.py
band-store layout); the per-batch joins carry the redundant bucket
equi-key so dynamic partition pruning bounds every history scan by the
batch's gram footprint. Counts contract to the distinct grams of the
batch (map-side combinable) before touching history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.round7 import _XSUB_K

_GRAM_BUCKETS = 64


def _with_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("g"), F.lit(_GRAM_BUCKETS))
    )


def batch_shingles(batch_docs: DataFrame) -> DataFrame:
    """(doc_id, p, g) k-gram digests for one batch — the same shingle
    construction the batch query uses (queries/round7.py)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), " +"), lambda t: t != ""
    )
    return (
        batch_docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= _XSUB_K)
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


def ingest_substr_batch(
    batch_docs: DataFrame,
    store_path: str,
    epoch_id: int,
) -> DataFrame:
    """Gate one micro-batch through the gram store; returns the anchors
    (doc_id, p) whose boilerplate verdict this batch decides. Pure
    DataFrame logic; epoch partitions make replays idempotent."""
    spark = batch_docs.sparkSession
    ng = batch_shingles(batch_docs).localCheckpoint(eager=True)
    cnt_b = _with_bucket(ng.groupBy("g").agg(F.count(F.lit(1)).alias("cnt")))

    cnt_path = os.path.join(store_path, "counts")
    pos_path = os.path.join(store_path, "positions")
    if os.path.exists(cnt_path):
        # join on (bucket, g): bucket is the store's partition column,
        # so DPP prunes the history scan to the batch's gram buckets
        hist = (
            spark.read.parquet(cnt_path)
            .filter(F.col("epoch") < epoch_id)
            .groupBy("bucket", "g")
            .agg(F.sum("cnt").alias("cnt_h"))
        )
        status = cnt_b.join(hist, ["bucket", "g"], "left_outer")
    else:
        status = cnt_b.withColumn("cnt_h", F.lit(None).cast("long"))
    status = status.select(
        "g",
        F.coalesce(F.col("cnt_h"), F.lit(0)).alias("cnt_h"),
        F.col("cnt").alias("cnt_b"),
    )
    newly = status.filter(
        (F.col("cnt_h") < 2) & (F.col("cnt_h") + F.col("cnt_b") >= 2)
    ).select("g")
    already = status.filter(F.col("cnt_h") >= 2).select("g")

    emitted = ng.join(newly.unionByName(already).distinct(), "g").select(
        "doc_id", "p"
    )
    if os.path.exists(pos_path):
        hist_pos = spark.read.parquet(pos_path).filter(
            F.col("epoch") < epoch_id
        )
        emitted = emitted.unionByName(
            hist_pos.join(_with_bucket(newly), ["bucket", "g"]).select(
                "doc_id", "p"
            )
        )
    emitted = emitted.localCheckpoint(eager=True)

    cnt_b.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(cnt_path, f"epoch={int(epoch_id)}")
    )
    _with_bucket(ng.select("g", "doc_id", "p")).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(
        os.path.join(pos_path, f"epoch={int(epoch_id)}")
    )
    return emitted
