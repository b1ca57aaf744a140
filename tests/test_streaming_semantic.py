"""Streaming semantic dedup (streaming/semantic.py): the online gate
must reproduce the batch x_semdedup verdict when the whole corpus is
one batch, stay associative across micro-batch boundaries for a fixed
codebook, replay idempotently, and keep survivors across compaction."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES
from realtime_banking_cdc_pipeline_spark.streaming.semantic import (
    _codebook_dir,
    compact_semantic_store,
    retrain_semantic_codebook,
    semantic_ingest_batch,
    start_semantic_ingest,
    train_codebook,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _ids(df):
    return sorted(r.vec_id for r in df.select("vec_id").collect())


def test_one_batch_matches_x_semdedup(spark, tmp_path):
    """Whole corpus as one batch into an empty store == the batch
    query: the codebook bootstrap uses the same prefix-centroid
    derivation as _two_level_cells, so cells — and therefore drops —
    are identical."""
    emb = _emb(spark)
    kept = semantic_ingest_batch(
        emb, str(tmp_path / "store"), str(tmp_path / "cb")
    )
    batch_keeps = sorted(
        r.vec_id
        for r in QUERIES["x_semdedup"].spark(spark, SF).collect()
        if r.keep
    )
    assert _ids(kept) == batch_keeps
    assert 0 < len(batch_keeps) < emb.count(), "fixture must drop some"


def test_micro_batched_matches_single_batch(spark, tmp_path):
    """Split ingest == one-batch ingest GIVEN a fixed codebook (the
    documented contract: associativity holds once the quantizer is
    pinned; the epoch-0 bootstrap is the one train-time divergence)."""
    emb = _emb(spark).cache()
    cb = str(tmp_path / "cb")
    train_codebook(emb, cb)

    one = semantic_ingest_batch(emb, str(tmp_path / "store_one"), cb)
    ids_one = _ids(one)

    store_two = str(tmp_path / "store_two")
    ids_two = []
    for lo, hi in [(0, 200), (200, 350), (350, 10**9)]:
        part = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        ids_two.extend(_ids(semantic_ingest_batch(part, store_two, cb)))
    assert ids_one == sorted(ids_two)


def test_epoch_replay_is_idempotent(spark, tmp_path):
    emb = _emb(spark).cache()
    cb = str(tmp_path / "cb")
    train_codebook(emb, cb)
    store = str(tmp_path / "store")
    b1 = emb.filter(F.col("vec_id") < 250)
    b2 = emb.filter(F.col("vec_id") >= 250)
    semantic_ingest_batch(b1, store, cb, epoch_id=0)
    kept2 = _ids(semantic_ingest_batch(b2, store, cb, epoch_id=1))
    rows_before = spark.read.parquet(store).count()
    # replay epoch 1 (foreachBatch at-least-once): same verdict, no
    # duplicate store rows
    kept2_replay = _ids(semantic_ingest_batch(b2, store, cb, epoch_id=1))
    assert kept2_replay == kept2
    assert spark.read.parquet(store).count() == rows_before


def test_compaction_preserves_gating(spark, tmp_path):
    emb = _emb(spark).cache()
    cb = str(tmp_path / "cb")
    train_codebook(emb, cb)

    ranges = [(0, 150), (150, 300), (300, 400), (400, 10**9)]
    parts = [
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        for lo, hi in ranges
    ]

    plain_store = str(tmp_path / "plain")
    plain_ids = []
    for e, p in enumerate(parts):
        plain_ids.extend(
            _ids(semantic_ingest_batch(p, plain_store, cb, epoch_id=e))
        )

    comp_store = str(tmp_path / "comp")
    comp_ids = []
    for e, p in enumerate(parts):
        comp_ids.extend(
            _ids(semantic_ingest_batch(p, comp_store, cb, epoch_id=e))
        )
        if e == 2:
            compact_semantic_store(spark, comp_store, e)
    assert sorted(comp_ids) == sorted(plain_ids)
    # history folded into the negative base; only base + later epochs remain
    eps = {
        int(n.split("=")[1])
        for n in os.listdir(comp_store)
        if n.startswith("epoch=")
    }
    assert eps == {-2, 2, 3}


def test_per_cell_budget_matches_uncapped_when_cells_fit(spark, tmp_path):
    """A budget no cell exceeds ⇒ byte-identical survivors to the
    uncapped gate (the x_semdedup_capped contract, online)."""
    emb = _emb(spark).cache()
    cb = str(tmp_path / "cb")
    train_codebook(emb, cb)
    plain = _ids(semantic_ingest_batch(emb, str(tmp_path / "plain"), cb))
    capped = _ids(
        semantic_ingest_batch(
            emb, str(tmp_path / "capped"), cb, per_cell_budget=10**6
        )
    )
    assert plain == capped


def test_per_cell_budget_bounds_skew_and_store(spark, tmp_path):
    """A replica burst (one doc repeated 300×) with budget=4: the
    burst still collapses to its first id, the store keeps only 4
    anchor rows for that cell, and a replayed epoch rewrites the same
    subset (replay-safe head-count)."""
    dim = 16
    store = str(tmp_path / "store")
    cb = str(tmp_path / "cb")
    b0 = _vec_df(spark, [(i, _unit(dim, i % 8)) for i in range(16)])
    semantic_ingest_batch(b0, store, cb, epoch_id=0, per_cell_budget=4)

    burst = _vec_df(
        spark, [(100 + i, _unit(dim, 3)) for i in range(300)]
    )
    kept = _ids(
        semantic_ingest_batch(burst, store, cb, epoch_id=1, per_cell_budget=4)
    )
    # every replica matches the stored e3 (ids 3 and 11 in epoch 0)
    assert kept == []
    rows_after = spark.read.parquet(store).count()
    # epoch 0 stored 2/cell; the burst's cell (3) takes only the 2
    # replicas that fit its budget — 18 anchor rows total, not 316
    assert rows_after == 18
    # replay epoch 1: same subset, same count
    kept_replay = _ids(
        semantic_ingest_batch(burst, store, cb, epoch_id=1, per_cell_budget=4)
    )
    assert kept_replay == [] and spark.read.parquet(store).count() == rows_after


def _vec_df(spark, rows):
    """rows = [(vec_id, [floats])] → (vec_id, embedding array<float>)."""
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _unit(dim, i, scale=1.0, extra=None):
    v = [0.0] * dim
    v[i] = scale
    if extra is not None:
        v[extra] = 1.0
    return v


def test_retrain_codebook_closes_drift(spark, tmp_path):
    """The codebook-drift remedy, exercised end-to-end: the bootstrap
    codebook is trained on an A-subspace batch; a B-subspace
    near-duplicate pair then straddles two A cells and the duplicate is
    MISSED (the documented graceful degradation — never a false drop).
    After `retrain_semantic_codebook` (recency-prefix codebook over the
    store), the refreshed centroids include B-subspace rows and a new B
    near-duplicate IS dropped; the store keeps every ingested vec_id,
    folds to a single base partition, and a second retrain is a no-op
    rewrite (idempotent)."""
    dim = 16
    store = str(tmp_path / "store")
    cb = str(tmp_path / "cb")

    # epoch 0 (bootstrap): ids 0..15 spanning A dims 0..7 twice —
    # k=adaptive_cells(16)=16 fine centroids, kc=4 coarse (≤ nprobe, so
    # assignment degenerates to the exact flat argmax: deterministic).
    b0 = _vec_df(spark, [(i, _unit(dim, i % 8)) for i in range(16)])
    semantic_ingest_batch(b0, store, cb, epoch_id=0)

    # epoch 1: B-subspace near-dup pair (cos≈0.917) whose small A
    # components pull them into DIFFERENT A cells → the dup escapes.
    b1 = _vec_df(spark, [
        (16, _unit(dim, 0, scale=0.3, extra=8)),
        (17, _unit(dim, 1, scale=0.3, extra=8)),
    ])
    kept1 = _ids(semantic_ingest_batch(b1, store, cb, epoch_id=1))
    assert kept1 == [16, 17], "drifted pair must straddle two A cells"

    # retrain at epoch 2: prefix = most recent (src_epoch, vec_id) →
    # centroids now include ids 17 and 16 (the B-heavy rows).
    retrain_semantic_codebook(spark, store, cb, 2)
    assert _ids(spark.read.parquet(store)) == list(range(18))
    # promote is pointer-based: CURRENT names the gen dir, the legacy
    # bootstrap layout is gone, and the resolver follows the pointer
    assert os.path.exists(os.path.join(cb, "CURRENT"))
    assert not os.path.exists(os.path.join(cb, "fine"))
    assert _codebook_dir(cb).endswith("gen-2")
    eps = {
        int(n.split("=")[1])
        for n in os.listdir(store)
        if n.startswith("epoch=")
    }
    assert eps == {-2}

    # epoch 2: another B near-dup (cos≈0.917 to both 16 and 17) now
    # lands in a B cell and is dropped — the remedy demonstrated.
    b2 = _vec_df(spark, [(18, _unit(dim, 2, scale=0.3, extra=8))])
    assert _ids(semantic_ingest_batch(b2, store, cb, epoch_id=2)) == []

    # idempotency: re-running the retrain leaves identical state.
    retrain_semantic_codebook(spark, store, cb, 3)
    snap1 = sorted(
        map(tuple, spark.read.parquet(store)
            .select("vec_id", "cid", "src_epoch").collect())
    )
    fine1 = sorted(
        map(tuple, spark.read.parquet(
            os.path.join(_codebook_dir(cb), "fine"))
            .select("cid", "ccid").collect())
    )
    retrain_semantic_codebook(spark, store, cb, 3)
    snap2 = sorted(
        map(tuple, spark.read.parquet(store)
            .select("vec_id", "cid", "src_epoch").collect())
    )
    fine2 = sorted(
        map(tuple, spark.read.parquet(
            os.path.join(_codebook_dir(cb), "fine"))
            .select("cid", "ccid").collect())
    )
    assert snap1 == snap2 and fine1 == fine2
    # gating still live through the rebuilt base: an exact replay of a
    # stored B vector is dropped.
    b3 = _vec_df(spark, [(19, _unit(dim, 2, scale=0.3, extra=8))])
    assert _ids(semantic_ingest_batch(b3, store, cb, epoch_id=3)) == []


def test_retrain_with_lloyd_refinement(spark, tmp_path):
    """lloyd_iters refinement: the retrain still preserves the store,
    still gates (a B replica of a refined-cell resident drops), and is
    bit-deterministic — two retrains over identical state produce
    identical fine codebooks (fixed iteration count, floor means,
    exact float32 round-trip)."""
    dim = 16
    store = str(tmp_path / "store")
    cb = str(tmp_path / "cb")
    b0 = _vec_df(spark, [(i, _unit(dim, i % 8)) for i in range(16)])
    semantic_ingest_batch(b0, store, cb, epoch_id=0)
    b1 = _vec_df(spark, [
        (16, _unit(dim, 0, scale=0.3, extra=8)),
        (17, _unit(dim, 1, scale=0.3, extra=8)),
    ])
    semantic_ingest_batch(b1, store, cb, epoch_id=1)

    retrain_semantic_codebook(spark, store, cb, 2, lloyd_iters=2)
    assert _ids(spark.read.parquet(store)) == list(range(18))
    # refined codebook still concentrates the B subspace: new B dup drops
    b2 = _vec_df(spark, [(18, _unit(dim, 2, scale=0.3, extra=8))])
    assert _ids(semantic_ingest_batch(b2, store, cb, epoch_id=2)) == []

    # determinism: re-running the lloyd retrain reproduces the codebook
    def fine_snap():
        return sorted(
            (r["cid"], tuple(round(float(x), 9) for x in r["cv"]))
            for r in spark.read.parquet(
                os.path.join(_codebook_dir(cb), "fine")
            ).select("cid", "cv").collect()
        )

    retrain_semantic_codebook(spark, store, cb, 3, lloyd_iters=2)
    s1 = fine_snap()
    retrain_semantic_codebook(spark, store, cb, 3, lloyd_iters=2)
    assert fine_snap() == s1


def test_retrain_applies_retention_horizon(spark, tmp_path):
    """Retrain with a retention horizon permanently drops rows older
    than the horizon (it is also the compaction) — survivors outside
    the horizon stop gating."""
    dim = 16
    store = str(tmp_path / "store")
    cb = str(tmp_path / "cb")
    b0 = _vec_df(spark, [(i, _unit(dim, i % 8)) for i in range(16)])
    semantic_ingest_batch(b0, store, cb, epoch_id=0)
    b1 = _vec_df(spark, [(16, _unit(dim, 3))])
    semantic_ingest_batch(b1, store, cb, epoch_id=1)
    # horizon of 1 epoch at epoch 2: only epoch-1 rows survive retrain
    retrain_semantic_codebook(spark, store, cb, 2, retention_epochs=1)
    assert _ids(spark.read.parquet(store)) == [16]
    # a replica of an evicted epoch-0 row is no longer gated
    b2 = _vec_df(spark, [(17, _unit(dim, 0))])
    assert _ids(semantic_ingest_batch(b2, store, cb, epoch_id=2)) == [17]


def test_readstream_wrapper_retrains(spark, tmp_path):
    """`retrain_every` wiring through foreachBatch: the drift fixture
    streamed as three files with retrain_every=1 — the retrain after
    epoch 1 must make epoch 2's B near-duplicate drop (the batch-level
    drift test, through the real stream)."""
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    dim = 16
    batches = [
        [(i, _unit(dim, i % 8)) for i in range(16)],
        [(16, _unit(dim, 0, scale=0.3, extra=8)),
         (17, _unit(dim, 1, scale=0.3, extra=8))],
        [(18, _unit(dim, 2, scale=0.3, extra=8))],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for vid, vec in rows:
                f.write(json.dumps(
                    {"vec_id": vid, "embedding": [float(x) for x in vec]}
                ) + "\n")
        # distinct mtimes pin the file-source batch order (b0 first:
        # the bootstrap batch must be the A-subspace one)
        os.utime(src / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    q = start_semantic_ingest(
        spark, str(src), str(tmp_path / "store"), str(tmp_path / "cb"),
        str(tmp_path / "out"), str(tmp_path / "ckpt"), schema,
        retrain_every=1,
    )
    q.awaitTermination(180)
    kept = _ids(spark.read.parquet(str(tmp_path / "out")))
    assert 18 not in kept, "retrained codebook must catch the B dup"
    assert {16, 17} <= set(kept)
    # every ingested id is in the store exactly once (retrain dedups)
    store_ids = _ids(spark.read.parquet(str(tmp_path / "store")))
    assert store_ids == list(range(19))


def test_readstream_wrapper(spark, tmp_path):
    """The foreachBatch wiring end-to-end over a 2-file JSON backlog."""
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    emb = _emb(spark).cache()
    rows = [
        {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding]}
        for r in emb.collect()
    ]
    src = tmp_path / "src"
    src.mkdir()
    half = len(rows) // 2
    for i, chunk in enumerate([rows[:half], rows[half:]]):
        with open(src / f"b{i}.json", "w") as f:
            for row in chunk:
                f.write(json.dumps(row) + "\n")
        # spaced mtimes: same-timestamp files stream in nondeterministic
        # order (see test_streaming_pipeline._write_stream_files)
        os.utime(src / f"b{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])
    cb = str(tmp_path / "cb")
    train_codebook(emb, cb)
    q = start_semantic_ingest(
        spark,
        str(src),
        str(tmp_path / "store"),
        cb,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        schema,
    )
    q.awaitTermination(120)
    got = _ids(spark.read.parquet(str(tmp_path / "out")))
    want = _ids(
        semantic_ingest_batch(emb, str(tmp_path / "store_ref"), cb)
    )
    assert got == want


def test_bootstrap_with_sparse_vec_ids(spark, tmp_path):
    """r8-ADVICE low: a stream starting mid-corpus (vec_ids not a
    0-based prefix) must not silently train an undersized codebook and
    pass everything — the bootstrap falls back to the TakeOrdered
    prefix, so the gate still drops near-duplicates."""
    emb = _emb(spark).withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    dup = emb.withColumn("vec_id", F.col("vec_id") + F.lit(5_000_000))
    batch = emb.unionByName(dup)  # every vector present exactly twice
    kept = semantic_ingest_batch(
        batch, str(tmp_path / "store"), str(tmp_path / "cb")
    )
    n = emb.count()
    # an undersized/empty codebook would keep all 2n rows; the gate
    # must drop (at least) every exact twin
    assert kept.count() <= n


def test_bootstrap_refuses_empty_batch(spark, tmp_path):
    import pytest as _pytest

    empty = _emb(spark).limit(0)
    with _pytest.raises(ValueError, match="empty embedding batch"):
        train_codebook(empty, str(tmp_path / "cb"))
