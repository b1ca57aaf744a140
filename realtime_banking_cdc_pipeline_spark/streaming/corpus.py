"""Streaming corpus ingest with incremental near-duplicate gating.

The batch near-dup ops (queries/llmdata.py) answer "dedup this corpus";
a production training-data pipeline also needs the ONLINE form: documents
arrive continuously, and each micro-batch must be deduplicated against
everything already ingested WITHOUT rescanning history. This is the
standard signature-store design: the corpus itself never re-flows —
only its MinHash signatures persist (num_perm longs per doc, ~1/1000th
of the text), and each batch runs two bounded LSH band joins:

  1. batch × store   — new docs vs every doc seen so far
  2. batch × batch   — duplicates arriving together

Drop rule (matches the batch ops' greedy-by-id): doc j is dropped iff
a doc i < j anywhere in the corpus shares >= match_min of num_perm
signature components. Signatures of ALL batch docs (kept AND dropped)
append to the store, which makes the rule associative across arbitrary
micro-batch boundaries: ingesting in one batch or twenty yields the
same survivor set (the equivalence the tests pin), provided doc ids
arrive monotonically (log-offset order — true for CDC/file-queue
sources; a late out-of-order doc still dedups against all history,
it just can't retroactively evict an already-emitted one).

At 100 TB: the store is a parquet table partitioned by band bucket,
the per-batch joins touch only the incoming ids' band keys (narrow
(id, band_idx, band_key) rows — `banded_keys`), and the band self-join
is the same single-join shape the batch path plan-pins. Nothing here
collects to the driver.

Reference analog: the reference ingests via kafka consumer →
`consumer/kafka_to_minio.py:15-24` and dedups only on exact event ids;
near-dup gating is part of this repo's training-data extension surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import (
    MINHASH_PERMS,
    banded_keys,
    minhash_signature,
)

_MATCH_MIN_DEFAULT = 8  # of 16 components => est. jaccard >= 0.5


def _match_pairs(
    left_sig: DataFrame,
    right_sig: DataFrame,
    num_perm: int,
    bands: int,
    match_min: int,
) -> DataFrame:
    """(id_a from left, id_b from right) pairs whose signatures agree on
    >= match_min components, found via one band-bucket equi-join over
    the narrow banded representation."""
    la = banded_keys(
        left_sig.select(F.col("doc_id").alias("id_a"), "*").drop("doc_id"),
        "id_a", num_perm, bands,
    )
    rb = banded_keys(
        right_sig.select(F.col("doc_id").alias("id_b"), "*").drop("doc_id"),
        "id_b", num_perm, bands,
    )
    pairs = (
        la.join(rb, ["band_idx", "band_key"])
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = left_sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"sig_{j}").alias(f"a_sig_{j}") for j in range(num_perm)],
    )
    sig_b = right_sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"sig_{j}").alias(f"b_sig_{j}") for j in range(num_perm)],
    )
    matches = sum(
        (F.col(f"a_sig_{j}") == F.col(f"b_sig_{j}")).cast("int")
        for j in range(num_perm)
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .filter(matches >= match_min)
        .select("id_a", "id_b")
    )


def ingest_batch(
    batch_docs: DataFrame,
    store_path: str,
    k: int = 3,
    num_perm: int = MINHASH_PERMS,
    bands: int = 4,
    match_min: int = _MATCH_MIN_DEFAULT,
    epoch_id: int | None = None,
) -> DataFrame:
    """Gate ONE micro-batch of documents (`doc_id`, `text`) against the
    signature store, returning the surviving rows; writes every batch
    signature into the store. Pure DataFrame logic so the same function
    serves foreachBatch and direct batch calls (the tests run both).

    EXACTLY-ONCE under foreachBatch replay: foreachBatch is
    at-least-once — a batch whose store write committed but whose
    checkpoint did not will RE-RUN, and with a plain append the retry
    would find its own signatures in the store and drop every doc as a
    self-duplicate. With ``epoch_id`` set (the streaming wrapper passes
    Spark's monotone batch id), each batch owns the store partition
    ``epoch=<id>``: the gate compares only against STRICTLY EARLIER
    epochs, and the partition write is an overwrite — a replay
    recomputes the identical verdict and the store ends up with exactly
    one copy. Without ``epoch_id`` (direct batch calls) the store is a
    flat append and the caller owns retry semantics."""
    spark = batch_docs.sparkSession
    sigs = minhash_signature(batch_docs, "doc_id", "text", k, num_perm)
    sigs.persist()
    dropped_within = (
        _match_pairs(sigs, sigs, num_perm, bands, match_min)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    dropped = dropped_within
    if os.path.exists(store_path):
        store = spark.read.parquet(store_path)
        if epoch_id is not None and "epoch" in store.columns:
            store = store.filter(F.col("epoch") < epoch_id).drop("epoch")
        dropped_vs_store = (
            _match_pairs(store, sigs, num_perm, bands, match_min)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        dropped = dropped.unionByName(dropped_vs_store).distinct()
    survivors = batch_docs.join(dropped, "doc_id", "left_anti")
    # Materialize the verdict BEFORE mutating the store (the plan reads
    # it): eager localCheckpoint cuts the lineage executor-side — the
    # verdict never flows through the driver.
    survivors = survivors.localCheckpoint(eager=True)
    if epoch_id is not None:
        sigs.write.mode("overwrite").parquet(
            os.path.join(store_path, f"epoch={int(epoch_id)}")
        )
    else:
        sigs.write.mode("append").parquet(store_path)
    sigs.unpersist()
    return survivors


def start_corpus_ingest(
    spark: SparkSession,
    src_path: str,
    store_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    max_files_per_trigger: int = 1,
    **gate_kwargs,
):
    """File-source streaming wrapper: each discovered file is one
    micro-batch through `ingest_batch`; survivors append to `out_path`.
    availableNow drains the backlog then stops — the batch-parity mode
    the tests use; drop it for a continuous tail."""

    def on_batch(batch_df: DataFrame, epoch: int) -> None:
        kept = ingest_batch(batch_df, store_path, epoch_id=epoch, **gate_kwargs)
        # survivors land in their own epoch partition too, so a batch
        # replay overwrites rather than duplicating output rows
        kept.write.mode("overwrite").parquet(
            os.path.join(out_path, f"epoch={int(epoch)}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(src_path)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
