"""Incremental near-dup corpus ingest: micro-batched gating against the
signature store must yield EXACTLY the same survivor set as one big
batch — the associativity the store-all-signatures design buys
(streaming/corpus.py). Both the direct-batch path and the real
readStream/foreachBatch wiring are pinned."""

from __future__ import annotations

import json
import shutil
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
    """The band-partitioned key store (bucket=pmod(xxhash64(bk_*),64)
    parquet partitions, probed on (bucket, band_idx, bk_*) — packed
    LONG band keys since r17, a bijection of the component tuple) must
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
    assert {"doc_id", "band_idx", "bk_0", "bk_1", "bucket", "epoch"} <= set(
        row.columns
    )
    docs.unpersist()


def test_compaction_preserves_survivors_and_bounds_partitions(spark, tmp_path):
    """Folding history into the epoch=-<e> base partition must not
    change any gating verdict, and must actually collapse the store's
    epoch partitions (the growth bound the 2M-doc probe measures)."""
    from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
        compact_corpus_store,
    )

    docs = _docs_with_neardups(spark).cache()
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    # near-copies (id>=1000) land in batches by (id+1000)%3 — originals
    # may be in EARLIER epochs, exercising the cross-epoch path

    plain_store = str(tmp_path / "plain")
    plain = [
        _survivor_ids(
            ingest_batch(t, plain_store, epoch_id=i,
                         banded_store_path=plain_store + "_b")
        )
        for i, t in enumerate(thirds)
    ]

    comp_store = str(tmp_path / "comp")
    comp = []
    for i, t in enumerate(thirds):
        comp.append(
            _survivor_ids(
                ingest_batch(t, comp_store, epoch_id=i,
                             banded_store_path=comp_store + "_b")
            )
        )
        if i > 0:  # compact after EVERY batch — maximal stress
            compact_corpus_store(
                spark, comp_store, i, banded_store_path=comp_store + "_b"
            )
    assert comp == plain

    # store collapsed TIERED (r9): each compaction folds only the
    # batch epochs since the previous base — base -1 holds epoch 0,
    # base -2 holds epoch 1, the current epoch rides uncompacted;
    # no batch partition survives, older bases stay immutable
    eps = sorted(
        int(d.split("=")[1])
        for d in os.listdir(comp_store)
        if d.startswith("epoch=")
    )
    assert eps == [-2, -1, 2]
    beps = sorted(
        int(d.split("=")[1])
        for d in os.listdir(comp_store + "_b")
        if d.startswith("epoch=")
    )
    assert beps == [-2, -1, 2]

    # a replayed compaction is a no-op
    compact_corpus_store(
        spark, comp_store, 2, banded_store_path=comp_store + "_b"
    )
    extra = ingest_batch(
        docs.limit(0), comp_store, epoch_id=3,
        banded_store_path=comp_store + "_b",
    )
    assert extra.count() == 0
    docs.unpersist()


def test_retention_horizon_bounds_lookback(spark, tmp_path):
    """With retention_epochs=1 a duplicate gates only against the
    previous epoch: a copy arriving 2 epochs after its original
    SURVIVES (outside horizon), while a copy 1 epoch later drops."""
    base = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 6)
        .cache()
    )
    dup_of_0_near = base.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    dup_of_0_far = base.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 200).alias("doc_id"), "text"
    )
    unrelated = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 36))
        .select((F.col("doc_id") + 50).alias("doc_id"), "text")
    )
    store = str(tmp_path / "store")
    kw = dict(banded_store_path=store + "_b", retention_epochs=1)
    k0 = _survivor_ids(ingest_batch(base, store, epoch_id=0, **kw))
    assert 0 in k0
    # epoch 1: dup of doc 0 — inside horizon (epoch 0 >= 1-1) => dropped
    k1 = _survivor_ids(ingest_batch(dup_of_0_near, store, epoch_id=1, **kw))
    assert k1 == []
    # epoch 2: unrelated docs push doc 0's AND doc 100's signatures out
    # of the next epoch's horizon (dropped docs' signatures persist, so
    # the epoch-1 copy would otherwise keep the chain alive)
    _survivor_ids(ingest_batch(unrelated, store, epoch_id=2, **kw))
    # epoch 3: dup of doc 0 — originals at epochs 0/1 < 3-1 => outside
    # horizon, survives (the bounded-lookback deployment contract)
    k3 = _survivor_ids(ingest_batch(dup_of_0_far, store, epoch_id=3, **kw))
    assert k3 == [200]

    # compaction with the same horizon drops the stale rows permanently
    from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
        compact_corpus_store,
    )

    compact_corpus_store(
        spark, store, 3, banded_store_path=store + "_b", retention_epochs=1
    )
    folded = spark.read.parquet(store).filter(F.col("epoch") == -3)
    assert set(r.src_epoch for r in folded.select("src_epoch").collect()) == {2}
    base.unpersist()


def test_banded_store_divergence_repair(spark, tmp_path):
    """Epochs ingested into the signature store while the banded store
    was absent must still gate later batches once the banded path is
    toggled on — the missing epochs re-band on read instead of being
    silently skipped."""
    docs = _docs_with_neardups(spark).cache()
    store = str(tmp_path / "store")
    banded = str(tmp_path / "store_banded")

    # epochs 0-1: NO banded store
    first = docs.filter(F.col("doc_id") < 20)
    second = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
    ingest_batch(first, store, epoch_id=0)
    ingest_batch(second, store, epoch_id=1)

    # epoch 2: banded path toggled on; the near-copies' originals live
    # in the UN-banded epochs 0-1
    third = docs.filter(F.col("doc_id") >= 1000)
    flat_ref_store = str(tmp_path / "ref")
    ingest_batch(first, flat_ref_store, epoch_id=0)
    ingest_batch(second, flat_ref_store, epoch_id=1)
    expected = _survivor_ids(ingest_batch(third, flat_ref_store, epoch_id=2))

    got = _survivor_ids(
        ingest_batch(third, store, epoch_id=2, banded_store_path=banded)
    )
    assert got == expected
    assert got == []  # every injected copy has an original in epochs 0-1
    docs.unpersist()


def test_replayed_compaction_never_rewrites_committed_base(spark, tmp_path):
    """A replayed compaction epoch must be a pure no-op on an
    already-committed base (rewriting it would make epoch=-<e> both a
    fold source and the overwrite target — the clear-then-crash loss
    window), while a PARTIAL base (no _SUCCESS: crash mid-write, fold
    sources still on disk) must be dropped and refolded."""
    from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
        compact_corpus_store,
    )

    docs = _docs_with_neardups(spark).cache()
    store = str(tmp_path / "store")
    banded = store + "_b"
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, t in enumerate(thirds[:2]):
        ingest_batch(t, store, epoch_id=i, banded_store_path=banded)
    compact_corpus_store(spark, store, 2, banded_store_path=banded)
    base = os.path.join(store, "epoch=-2")
    assert os.path.exists(os.path.join(base, "_SUCCESS"))

    # committed base: replay must not touch its files
    sentinel = os.path.join(base, "_sentinel_replay_guard")
    open(sentinel, "w").close()
    compact_corpus_store(spark, store, 2, banded_store_path=banded)
    assert os.path.exists(sentinel), "committed base was rewritten on replay"
    os.remove(sentinel)

    # partial base: strip _SUCCESS (simulates crash mid-write with the
    # fold sources still present) and re-create a source partition —
    # the replay must rebuild the base and gating must still drop every
    # known near-dup
    os.remove(os.path.join(base, "_SUCCESS"))
    ingest_batch(thirds[0], store, epoch_id=0, banded_store_path=banded)
    compact_corpus_store(spark, store, 2, banded_store_path=banded)
    assert os.path.exists(os.path.join(base, "_SUCCESS"))
    got = _survivor_ids(
        ingest_batch(
            docs.filter(F.col("doc_id") >= 1000),
            store, epoch_id=2, banded_store_path=banded,
        )
    )
    assert got == []  # originals folded in the rebuilt base still gate
    docs.unpersist()


def test_replayed_hll_compaction_preserves_committed_base(spark, tmp_path):
    """Same replay contract for the HLL register store: committed base
    untouched on replay; partial base refolded from surviving sources."""
    from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
        compact_hll_store,
        read_hll_store,
        update_hll_store,
    )

    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("source", "text")
    )
    store = str(tmp_path / "hll")
    update_hll_store(docs.filter(F.length("text") % 2 == 0), store,
                     key_col="source", value_col="text", epoch_id=1)
    update_hll_store(docs.filter(F.length("text") % 2 == 1), store,
                     key_col="source", value_col="text", epoch_id=2)
    whole = {
        (r.key, r.bucket): r.m_j
        for r in read_hll_store(spark, store).collect()
    }
    compact_hll_store(spark, store, epoch_id=2)
    base = os.path.join(store, "epoch=-2")
    sentinel = os.path.join(base, "_sentinel_replay_guard")
    open(sentinel, "w").close()
    compact_hll_store(spark, store, epoch_id=2)
    assert os.path.exists(sentinel), "committed base was rewritten on replay"

    # partial base: drop _SUCCESS, restore a source partition, refold
    os.remove(os.path.join(base, "_SUCCESS"))
    update_hll_store(docs, store, key_col="source", value_col="text",
                     epoch_id=1)
    compact_hll_store(spark, store, epoch_id=2)
    got = {
        (r.key, r.bucket): r.m_j
        for r in read_hll_store(spark, store).collect()
    }
    assert got == whole
    docs.unpersist()


def test_tiered_compaction_consolidates_at_max_bases(spark, tmp_path):
    """r9 tiered compaction: each fold writes its own small base; when
    max_bases committed generations exist the next fold CONSOLIDATES
    (full merge) so partition count stays bounded. Verdicts must be
    unaffected throughout (parity vs the never-compacted store)."""
    from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
        compact_corpus_store,
    )

    docs = _docs_with_neardups(spark).cache()
    parts = [docs.filter(F.col("doc_id") % 5 == i) for i in range(5)]

    plain_store = str(tmp_path / "plain")
    plain = [
        _survivor_ids(ingest_batch(t, plain_store, epoch_id=i))
        for i, t in enumerate(parts)
    ]

    store = str(tmp_path / "tiered")
    got = []
    for i, t in enumerate(parts):
        got.append(_survivor_ids(ingest_batch(t, store, epoch_id=i)))
        if i > 0:  # compact after every batch, max_bases=2
            compact_corpus_store(spark, store, i, max_bases=2)
    assert got == plain

    def eps():
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(store)
            if d.startswith("epoch=")
        )

    # compactions at 1,2 wrote tiered bases -1,-2; at 3 two committed
    # bases existed -> consolidation merged everything into -3; at 4
    # tiered again on top of -3
    assert eps() == [-4, -3, 4]
    # all rows accounted for: the folded store equals epochs 0..3
    folded = spark.read.parquet(store).filter(F.col("epoch") < 0)
    assert sorted(
        r.src_epoch for r in folded.select("src_epoch").distinct().collect()
    ) == [0, 1, 2, 3]
    docs.unpersist()


def test_tiered_retention_retires_expired_bases_whole(spark, tmp_path):
    """With a retention horizon, an old generation whose newest row has
    expired is DELETED as a directory — the constant-state mode never
    pays a full-store rewrite."""
    from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
        compact_corpus_store,
    )

    docs = _docs_with_neardups(spark).cache()
    parts = [docs.filter(F.col("doc_id") % 5 == i) for i in range(5)]
    store = str(tmp_path / "ret")
    for i, t in enumerate(parts):
        ingest_batch(t, store, epoch_id=i, retention_epochs=2)
        if i > 0:
            compact_corpus_store(
                spark, store, i, retention_epochs=2, max_bases=100
            )
    eps = sorted(
        int(d.split("=")[1])
        for d in os.listdir(store)
        if d.startswith("epoch=")
    )
    # base -e holds src e-1 only (compact-every-batch); with R=2 at
    # epoch 4 every base whose newest src < 2 is gone: -1 (src 0) and
    # -2 (src 1) retired whole, -3 (src 2) and -4 (src 3) live
    assert eps == [-4, -3, 4]
    docs.unpersist()


def test_consolidation_replay_deletes_subsumed_bases(spark, tmp_path):
    """ADVICE r9 crash window: a consolidating fold commits its base but
    crashes before cleanup. The REPLAYED compaction must reach the same
    consolidate verdict (decided on bases strictly older than the fold,
    so the now-committed base -E cannot flip it back to tiered) and
    delete the older bases whose rows base -E already holds — otherwise
    the duplicates persist in every future read and fold."""
    import realtime_banking_cdc_pipeline_spark.streaming.corpus as corpus_mod
    from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
        compact_corpus_store,
    )

    docs = _docs_with_neardups(spark).cache()
    parts = [docs.filter(F.col("doc_id") % 5 == i) for i in range(4)]
    store = str(tmp_path / "crash")
    for i, t in enumerate(parts[:3]):
        ingest_batch(t, store, epoch_id=i)
        if i > 0:  # bases -1, -2 committed; max_bases=2 from here on
            compact_corpus_store(spark, store, i, max_bases=2)
    ingest_batch(parts[3], store, epoch_id=3)

    def eps():
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(store)
            if d.startswith("epoch=")
        )

    assert eps() == [-2, -1, 2, 3]

    # compaction at 3 consolidates (two prior bases >= max_bases) but
    # "crashes" after committing base -3, before any cleanup
    real_cleanup = corpus_mod._compact_cleanup
    corpus_mod._compact_cleanup = lambda *a, **k: None
    try:
        compact_corpus_store(spark, store, 3, max_bases=2)
    finally:
        corpus_mod._compact_cleanup = real_cleanup
    assert -3 in eps() and -1 in eps()  # crash state: base + stale history

    # replay: must re-derive "consolidating" and clear the subsumed
    # bases -1/-2 and batch epoch 2 without rewriting committed base -3
    compact_corpus_store(spark, store, 3, max_bases=2)
    assert eps() == [-3, 3]

    # no duplicate signature rows anywhere in the store
    hist = spark.read.parquet(store)
    assert hist.count() == hist.distinct().count()
    assert sorted(
        r.src_epoch
        for r in hist.filter(F.col("epoch") < 0)
        .select("src_epoch")
        .distinct()
        .collect()
    ) == [0, 1, 2]
    docs.unpersist()


def test_compaction_skips_rowless_epoch_partitions(spark, tmp_path):
    """A batch that arrives entirely duplicate writes a rowless
    epoch partition (only _SUCCESS) — the composed pipeline's exact
    gate produces these routinely. Tiered compaction must skip such
    partitions when it lists fold sources explicitly (an explicit
    parquet read over a file-less dir cannot infer schema) and still
    clean them up."""
    from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
        compact_corpus_store,
    )

    docs = _docs_with_neardups(spark).cache()
    store = str(tmp_path / "store")
    ingest_batch(docs.filter(F.col("doc_id") % 5 == 0), store, epoch_id=0)
    ingest_batch(docs.filter(F.col("doc_id") % 5 == 1), store, epoch_id=1)
    # epoch 2 arrives with zero rows
    ingest_batch(docs.filter(F.col("doc_id") < -1), store, epoch_id=2)
    before = spark.read.parquet(store).count()
    assert before > 0
    compact_corpus_store(spark, store, 3)  # must not raise
    hist = spark.read.parquet(store)
    assert hist.count() == before
    eps = sorted(
        int(x.split("=")[1])
        for x in os.listdir(store)
        if x.startswith("epoch=")
    )
    assert eps == [-3]
    docs.unpersist()


def test_consolidation_survives_crash_mid_cleanup(spark, tmp_path):
    """ADVICE r10: the consolidate verdict must be durable, not
    recomputed. A crash MID-CLEANUP (some subsumed bases already
    deleted) leaves < max_bases older generations on disk; a replay
    that recomputes the verdict from the survivors flips to tiered and
    then KEEPS the remaining older bases whose rows base -E already
    holds — permanent duplicates. The _CONSOLIDATED marker inside the
    committed base pins the verdict across replays."""
    import realtime_banking_cdc_pipeline_spark.streaming.corpus as corpus_mod
    from realtime_banking_cdc_pipeline_spark.streaming.corpus import (
        compact_corpus_store,
    )

    docs = _docs_with_neardups(spark).cache()
    parts = [docs.filter(F.col("doc_id") % 5 == i) for i in range(4)]
    store = str(tmp_path / "midcrash")
    for i, t in enumerate(parts[:3]):
        ingest_batch(t, store, epoch_id=i)
        if i > 0:
            compact_corpus_store(spark, store, i, max_bases=2)
    ingest_batch(parts[3], store, epoch_id=3)

    def eps():
        return sorted(
            int(d.split("=")[1])
            for d in os.listdir(store)
            if d.startswith("epoch=")
        )

    assert eps() == [-2, -1, 2, 3]

    # consolidation at 3 commits base -3, then cleanup "crashes" after
    # deleting only ONE subsumed base (-1): partial-cleanup state
    real_cleanup = corpus_mod._compact_cleanup

    def partial_cleanup(path, epoch_id, retention, incremental, bases):
        shutil.rmtree(os.path.join(path, "epoch=-1"), ignore_errors=True)

    corpus_mod._compact_cleanup = partial_cleanup
    try:
        compact_corpus_store(spark, store, 3, max_bases=2)
    finally:
        corpus_mod._compact_cleanup = real_cleanup
    # crash state: committed base -3 + marker, -2 still on disk — a
    # recomputed verdict would now see 1 < max_bases prior bases
    assert eps() == [-3, -2, 2, 3]
    assert os.path.exists(os.path.join(store, "epoch=-3", "_CONSOLIDATED"))

    # replay must read consolidate from the marker and finish cleanup
    compact_corpus_store(spark, store, 3, max_bases=2)
    assert eps() == [-3, 3]
    hist = spark.read.parquet(store)
    assert hist.count() == hist.distinct().count()
    assert sorted(
        r.src_epoch
        for r in hist.filter(F.col("epoch") < 0)
        .select("src_epoch")
        .distinct()
        .collect()
    ) == [0, 1, 2]
    docs.unpersist()


def test_consolidating_compaction_tolerates_all_rowless_store(
    spark, tmp_path
):
    """ADVICE r10: the consolidating (incremental=False) branch
    root-scans the store; a store whose EVERY epoch partition is
    rowless (only _SUCCESS — the exact state the ingest-side
    _has_parquet_files guards were added for) fails schema inference.
    The fold must skip gracefully and still clear the debris."""
    import realtime_banking_cdc_pipeline_spark.streaming.corpus as corpus_mod

    store = str(tmp_path / "rowless")
    for e in (0, 1):
        part = os.path.join(store, f"epoch={e}")
        os.makedirs(part)
        open(os.path.join(part, "_SUCCESS"), "w").close()
    corpus_mod._compact_store(
        spark, store, 2, None, None, incremental=False
    )  # must not raise
    eps = [d for d in os.listdir(store) if d.startswith("epoch=")]
    assert eps == []


def test_legacy_string_banded_store_falls_back_to_flat(spark, tmp_path):
    """A banded store written by pre-r17 code carries string band_key
    columns; the r17 packed-long probe cannot union with it, so the
    gate must IGNORE it and fall back to the flat re-band path — same
    survivors, never a schema error or a silently skipped candidate."""
    import os as _os
    import shutil as _shutil

    docs = _docs_with_neardups(spark).cache()
    first = docs.filter(F.col("doc_id") < 20)
    second = docs.filter(F.col("doc_id") >= 20)

    flat = str(tmp_path / "flat")
    ingest_batch(first, flat, epoch_id=0)
    expected = _survivor_ids(ingest_batch(second, flat, epoch_id=1))

    store = str(tmp_path / "store")
    banded = str(tmp_path / "banded")
    ingest_batch(first, store, epoch_id=0, banded_store_path=banded)
    # rewrite epoch 0 of the banded store in the legacy narrow string
    # layout (pre-r17: band_key string, no packed bk_*/sp_* columns)
    legacy = (
        spark.read.parquet(_os.path.join(banded, "epoch=0"))
        .select(
            "doc_id", "band_idx",
            F.concat_ws("-", "bk_0", "bk_1").alias("band_key"),
            "bucket",
        )
        .localCheckpoint(eager=True)
    )
    _shutil.rmtree(_os.path.join(banded, "epoch=0"))
    legacy.write.mode("overwrite").partitionBy("bucket").parquet(
        _os.path.join(banded, "epoch=0")
    )
    got = _survivor_ids(
        ingest_batch(second, store, epoch_id=1, banded_store_path=banded)
    )
    assert got == expected
    docs.unpersist()
