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
    compact_semantic_store,
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
