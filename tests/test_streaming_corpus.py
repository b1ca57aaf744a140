"""Incremental near-dup corpus ingest: micro-batched gating against the
signature store must yield EXACTLY the same survivor set as one big
batch — the associativity the store-all-signatures design buys
(streaming/corpus.py). Both the direct-batch path and the real
readStream/foreachBatch wiring are pinned."""

from __future__ import annotations

import json
import time
import os

from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
    ingest_batch,
    start_corpus_ingest,
)

SF = "/root/testdata/sf0.001"


def _docs_with_neardups(spark):
    """sf0.001 documents plus, for every 3rd doc, a near-copy (one token
    appended) at a higher id — guaranteed near-dup mass with monotone
    ids."""
    base = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 30)
    )
    offset = 1000
    copies = (
        base.filter(F.col("doc_id") % 3 == 0)
        .select(
            (F.col("doc_id") + offset).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
    )
    return base.unionByName(copies)


def _survivor_ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_micro_batched_ingest_matches_single_batch(spark, tmp_path):
    docs = _docs_with_neardups(spark).cache()
    n_docs = docs.count()

    one = ingest_batch(docs, str(tmp_path / "store_one"))
    ids_one = _survivor_ids(one)
    assert 0 < len(ids_one) < n_docs, "gate must drop some but not all"
    # every injected near-copy (id >= 1000) has an original < its id
    assert not any(i >= 1000 for i in ids_one)

    store_two = str(tmp_path / "store_two")
    first = docs.filter(F.col("doc_id") < 20)
    second = docs.filter(F.col("doc_id") >= 20)
    kept = ingest_batch(first, store_two)
    kept2 = ingest_batch(second, store_two)
    ids_two = _survivor_ids(kept) + _survivor_ids(kept2)
    assert sorted(ids_two) == ids_one

    # the store holds EVERY signature (kept + dropped): the invariant
    # that makes the greedy-by-id rule batch-boundary-free
    assert spark.read.parquet(store_two).count() == n_docs
    docs.unpersist()


def test_readstream_foreachbatch_ingest(spark, tmp_path):
    docs = _docs_with_neardups(spark)
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    src = tmp_path / "src"
    src.mkdir()
    mid = len(rows) // 2
    now = time.time()
    for i, chunk in enumerate((rows[:mid], rows[mid:])):
        p = src / f"part-{i}.json"
        with open(p, "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")
        # FileStreamSource orders by mtime; same-millisecond files tie-
        # break arbitrarily, which would break the monotone-arrival
        # contract the gate documents — pin strictly increasing mtimes.
        os.utime(p, (now - 60 + 30 * i, now - 60 + 30 * i))

    out = str(tmp_path / "out")
    q = start_corpus_ingest(
        spark,
        str(src),
        str(tmp_path / "store"),
        out,
        str(tmp_path / "ckpt"),
        schema="doc_id BIGINT, text STRING",
    )
    # availableNow terminates once the backlog drains; block until then
    # (a bounded wait can return early under load and read partial output)
    q.awaitTermination()
    assert not q.isActive

    expected = _survivor_ids(ingest_batch(docs, str(tmp_path / "store_ref")))
    assert _survivor_ids(spark.read.parquet(out)) == expected


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch (same epoch)
    must produce the identical survivor set and leave exactly ONE copy
    of its signatures in the store — the epoch-partition overwrite
    contract. Without it, a retry would self-match against its own
    signatures and drop the whole batch."""
    docs = _docs_with_neardups(spark).cache()
    store = str(tmp_path / "store")
    first = docs.filter(F.col("doc_id") < 20)
    second = docs.filter(F.col("doc_id") >= 20)

    k0 = _survivor_ids(ingest_batch(first, store, epoch_id=0))
    k0_replay = _survivor_ids(ingest_batch(first, store, epoch_id=0))
    assert k0_replay == k0, "replayed epoch must not self-match"
    assert spark.read.parquet(store).count() == first.count()

    k1 = _survivor_ids(ingest_batch(second, store, epoch_id=1))
    ref = _survivor_ids(ingest_batch(docs, str(tmp_path / "store_ref")))
    assert sorted(k0 + k1) == ref
    docs.unpersist()


def test_banded_store_path_matches_flat_path(spark, tmp_path):
    """The band-partitioned key store (bucket=pmod(xxhash64(band_key),64)
    parquet partitions, probed on (bucket, band_idx, band_key)) must
    yield the identical survivor set as the flat re-band-on-read path,
    and must actually lay bucket directories on disk."""
    docs = _docs_with_neardups(spark).cache()
    first = docs.filter(F.col("doc_id") < 20)
    second = docs.filter(F.col("doc_id") >= 20)

    flat = str(tmp_path / "flat")
    f0 = _survivor_ids(ingest_batch(first, flat, epoch_id=0))
    f1 = _survivor_ids(ingest_batch(second, flat, epoch_id=1))

    store = str(tmp_path / "store")
    banded = str(tmp_path / "store_banded")
    b0 = _survivor_ids(
        ingest_batch(first, store, epoch_id=0, banded_store_path=banded)
    )
    b1 = _survivor_ids(
        ingest_batch(second, store, epoch_id=1, banded_store_path=banded)
    )
    assert (b0, b1) == (f0, f1)

    buckets = [
        d
        for d in os.listdir(os.path.join(banded, "epoch=0"))
        if d.startswith("bucket=")
    ]
    assert len(buckets) > 1, "banded store must be bucket-partitioned"
    row = spark.read.parquet(banded).limit(1)
    assert {"doc_id", "band_idx", "band_key", "bucket", "epoch"} <= set(
        row.columns
    )
    docs.unpersist()
