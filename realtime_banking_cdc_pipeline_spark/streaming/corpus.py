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

# Band-partitioned store layout: banded key rows land in
# bucket=pmod(xxhash64(band_key), _BAND_BUCKETS) parquet partitions, so
# the per-batch candidate probe joins on (bucket, band_idx, band_key)
# and Spark's dynamic partition pruning reads ONLY the store buckets the
# incoming batch's band keys hash into — the store scan is bounded by
# the batch's key footprint, not the store's history. (xxhash64 is
# Spark-deterministic; a cross-engine store would pin md5 instead.)
_BAND_BUCKETS = 64


def _match_pairs(
    left_sig: DataFrame,
    right_sig: DataFrame,
    num_perm: int,
    bands: int,
    match_min: int,
    left_banded: DataFrame | None = None,
) -> DataFrame:
    """(id_a from left, id_b from right) pairs whose signatures agree on
    >= match_min components, found via one band-bucket equi-join over
    the narrow banded representation. ``left_banded`` supplies a
    pre-banded (id_a, band_idx, band_key[, bucket]) frame — the
    band-partitioned store path — in place of banding ``left_sig``."""
    la = (
        left_banded
        if left_banded is not None
        else banded_keys(
            left_sig.select(F.col("doc_id").alias("id_a"), "*").drop("doc_id"),
            "id_a", num_perm, bands,
        )
    )
    rb = banded_keys(
        right_sig.select(F.col("doc_id").alias("id_b"), "*").drop("doc_id"),
        "id_b", num_perm, bands,
    )
    join_keys = ["band_idx", "band_key"]
    if "bucket" in la.columns:
        # redundant equi-key on the partition column activates dynamic
        # partition pruning against the bucket-partitioned store scan
        rb = rb.withColumn(
            "bucket", F.pmod(F.xxhash64("band_key"), F.lit(_BAND_BUCKETS))
        )
        join_keys = ["bucket", "band_idx", "band_key"]
    pairs = (
        la.join(rb, join_keys)
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
    banded_store_path: str | None = None,
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
    flat append and the caller owns retry semantics.

    ``banded_store_path`` maintains the BAND-PARTITIONED key store
    alongside the signature store: the batch's (doc_id, band_idx,
    band_key) rows land in ``bucket=pmod(xxhash64(band_key), 64)``
    parquet partitions, and candidate generation against history probes
    that store on (bucket, band_idx, band_key) — dynamic partition
    pruning bounds the store scan by the batch's key footprint while
    the wide signature rows are read only for the candidate refinement
    join. This is the 100 TB store layout; the flat path (None) re-bands
    the signature store on every read."""
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
        store_banded = None
        if banded_store_path is not None and os.path.exists(banded_store_path):
            store_banded = spark.read.parquet(banded_store_path)
            if epoch_id is not None and "epoch" in store_banded.columns:
                store_banded = store_banded.filter(
                    F.col("epoch") < epoch_id
                ).drop("epoch")
            store_banded = store_banded.withColumnRenamed("doc_id", "id_a")
        dropped_vs_store = (
            _match_pairs(
                store, sigs, num_perm, bands, match_min,
                left_banded=store_banded,
            )
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
    if banded_store_path is not None:
        batch_banded = banded_keys(sigs, "doc_id", num_perm, bands).withColumn(
            "bucket", F.pmod(F.xxhash64("band_key"), F.lit(_BAND_BUCKETS))
        )
        if epoch_id is not None:
            batch_banded.write.mode("overwrite").partitionBy("bucket").parquet(
                os.path.join(banded_store_path, f"epoch={int(epoch_id)}")
            )
        else:
            batch_banded.write.mode("append").partitionBy("bucket").parquet(
                banded_store_path
            )
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
    the tests use; drop it for a continuous tail. The wrapper maintains
    the band-partitioned key store (``<store_path>_banded``) by default
    — the layout the candidate probe prunes against at scale."""
    gate_kwargs.setdefault("banded_store_path", store_path + "_banded")

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
