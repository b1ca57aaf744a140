"""Streaming ExactSubstr store-maintenance parity (r8 judge directive
#8): the gram store must match the corpus/semantic stores' contract —
tiered epoch compaction that never changes an emission, a retention
horizon with deterministic bounded-lookback semantics, replay
idempotence across compaction, and the real readStream wiring.
(The core emission-associativity invariant is pinned in
test_round7_properties.py::test_incremental_substr_anchors_match_batch;
this suite adds the store-maintenance axis.)"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.streaming.substr import (
    batch_shingles,
    compact_substr_store,
    ingest_substr_batch,
    start_substr_ingest,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )


def _anchors(df):
    return {(r.doc_id, r.p) for r in df.select("doc_id", "p").collect()}


def _batch_truth(spark):
    ng = batch_shingles(_docs(spark))
    rep = (
        ng.groupBy("g1", "g2")
        .count()
        .filter(F.col("count") >= 2)
        .select("g1", "g2")
    )
    return _anchors(ng.join(rep, ["g1", "g2"]))


def test_compaction_preserves_emissions(spark, tmp_path):
    """Compacting after EVERY batch must not change any emission: the
    union still equals the batch-mode anchor set, no anchor twice."""
    docs = _docs(spark).cache()
    truth = _batch_truth(spark)
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    store = str(tmp_path / "store")
    got: set = set()
    for e, b in enumerate(thirds):
        out = _anchors(ingest_substr_batch(b, store, e))
        assert not (out & got), "anchor emitted twice across epochs"
        got |= out
        if e > 0:
            compact_substr_store(spark, store, e)
    assert got == truth
    # tiered layout on both tables: bases -1/-2 + live epoch 2
    for sub in ("counts", "positions"):
        eps = sorted(
            int(d.split("=")[1])
            for d in os.listdir(os.path.join(store, sub))
            if d.startswith("epoch=")
        )
        assert eps == [-2, -1, 2]
    docs.unpersist()


def test_replay_after_compaction_is_idempotent(spark, tmp_path):
    """A replayed epoch — including the compaction trigger itself —
    reproduces its original emission bit-for-bit (the strictly-earlier
    horizon + committed-base no-rewrite contract)."""
    docs = _docs(spark).cache()
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    store = str(tmp_path / "store")
    outs = []
    for e, b in enumerate(thirds):
        outs.append(_anchors(ingest_substr_batch(b, store, e)))
        if e > 0:
            compact_substr_store(spark, store, e)
        # immediate replay models the real crash window (last
        # uncommitted batch) — emission and store must be unchanged
        assert _anchors(ingest_substr_batch(b, store, e)) == outs[e]
        if e > 0:
            compact_substr_store(spark, store, e)  # replayed compaction
    assert set().union(*outs) == _batch_truth(spark)
    docs.unpersist()


def test_retention_horizon_bounds_gram_lookback(spark, tmp_path):
    """With retention_epochs=1 a gram repeated 2 epochs after its only
    earlier occurrence does NOT flag (history expired), while a repeat
    1 epoch later flags both sites — deterministic bounded-lookback
    semantics, same contract as the corpus store."""
    base = _docs(spark).filter(F.col("doc_id") == 0).cache()
    assert base.count() == 1
    mk = lambda i: base.select((F.col("doc_id") + i).alias("doc_id"), "text")
    filler = _docs(spark).filter(
        (F.col("doc_id") >= 10) & (F.col("doc_id") < 13)
    )
    store = str(tmp_path / "near")
    kw = dict(retention_epochs=1)
    assert _anchors(ingest_substr_batch(mk(0), store, 0, **kw)) == set()
    # epoch 1: exact copy — originals at epoch 0 inside horizon (>= 0)
    near = _anchors(ingest_substr_batch(mk(100), store, 1, **kw))
    assert near and {d for d, _ in near} == {0, 100}

    store2 = str(tmp_path / "far")
    assert _anchors(ingest_substr_batch(mk(0), store2, 0, **kw)) == set()
    _anchors(ingest_substr_batch(filler, store2, 1, **kw))
    # epoch 2: copy of epoch-0 doc — epoch 0 < 2-1, outside horizon
    far = _anchors(ingest_substr_batch(mk(200), store2, 2, **kw))
    assert {d for d, _ in far} <= {200} and not {d for d, _ in far} & {0}
    # within-batch self-repeats may still anchor doc 200 itself; the
    # expired original must not resurface
    base.unpersist()


def test_retention_compaction_retires_expired_generations(spark, tmp_path):
    """With a horizon, maintenance is RETIRE-ONLY: expired batch
    epochs delete as whole directories (no fold, no base writes) and
    live epochs stay untouched — the horizon itself is the state
    bound."""
    docs = _docs(spark).cache()
    parts = [docs.filter(F.col("doc_id") % 5 == i) for i in range(5)]
    store = str(tmp_path / "store")
    for e, b in enumerate(parts):
        ingest_substr_batch(b, store, e, retention_epochs=2)
        if e > 0:
            compact_substr_store(
                spark, store, e, retention_epochs=2, max_bases=100
            )
    for sub in ("counts", "positions"):
        eps = sorted(
            int(d.split("=")[1])
            for d in os.listdir(os.path.join(store, sub))
            if d.startswith("epoch=")
        )
        # retire-only at epoch 4 with R=2: epochs < 2 deleted, no
        # bases ever written; live partitions = 2, 3, 4
        assert eps == [2, 3, 4]
    docs.unpersist()


def test_readstream_wrapper_matches_batch(spark, tmp_path):
    """Real readStream/foreachBatch wiring with compaction every 2
    batches: drained emissions equal the batch-mode anchor set."""
    docs = _docs(spark)
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    src = tmp_path / "src"
    src.mkdir()
    n = len(rows) // 3
    now = time.time()
    for i, chunk in enumerate((rows[:n], rows[n : 2 * n], rows[2 * n :])):
        p = src / f"part-{i}.json"
        with open(p, "w") as f:
            for r in chunk:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")
        os.utime(p, (now - 90 + 30 * i, now - 90 + 30 * i))
    out = str(tmp_path / "out")
    q = start_substr_ingest(
        spark, str(src), str(tmp_path / "store"), out,
        str(tmp_path / "ckpt"), "doc_id BIGINT, text STRING",
        compact_every=2,
    )
    q.awaitTermination()
    assert _anchors(spark.read.parquet(out)) == _batch_truth(spark)


def test_positions_fold_drops_dead_rows_keeps_retro(spark, tmp_path):
    """The positions fold keeps ONLY singleton grams: positions of
    already-repeated grams have retro-emitted and are dead. A gram
    still singleton at fold time must survive the fold and retro-emit
    when its repeat arrives AFTER the compaction."""
    from pyspark.sql import Row

    k_tok = " ".join(f"w{i}" for i in range(8))        # one k-gram
    solo = " ".join(f"s{i}" for i in range(8))          # stays singleton
    mk = lambda rows: spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in rows]
    )
    store = str(tmp_path / "store")
    # epoch 0: doc 0 carries gram A (will repeat at epoch 2),
    #          docs 1+2 both carry gram B (repeats immediately)
    e0 = _anchors(
        ingest_substr_batch(
            mk([(0, k_tok), (1, solo), (2, solo)]), store, 0
        )
    )
    assert {d for d, _ in e0} == {1, 2}  # B emitted, A singleton
    compact_substr_store(spark, store, 1)
    # positions base: gram B's rows dead -> only doc 0's gram A row
    base = spark.read.parquet(
        os.path.join(store, "positions", "epoch=-1")
    )
    assert {r.doc_id for r in base.select("doc_id").collect()} == {0}
    # epoch 1 (post-fold): A repeats -> retro-emits doc 0's position
    # from the pruned base plus the new doc's
    e1 = _anchors(ingest_substr_batch(mk([(10, k_tok)]), store, 1))
    assert {d for d, _ in e1} == {0, 10}
