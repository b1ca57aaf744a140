"""Streaming vocabulary-coverage monitor (metrics.py): the streaming
twin of x_ngram_coverage_curve. Pins:

1. batch parity — over id-ordered micro-batches, each epoch's n_new
   equals the batch coverage curve's per-doc n_new summed over that
   epoch's docs (global min-doc_id attribution == first-epoch
   attribution under id-ordered arrivals), and the final vocab_size
   equals the batch query's vocabulary;
2. replay idempotence — re-running the last epoch reproduces its
   summary row and leaves the store's digest set unchanged;
3. compaction preserves the probe verdicts and the vocabulary.
"""

from __future__ import annotations

import json
import os

from realtime_banking_cdc_pipeline_spark.queries import QUERIES
from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
    compact_coverage_store,
    coverage_monitor_batch,
    read_coverage_health,
    start_coverage_monitor,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id bigint, text string"


def _doc_rows(spark, n=60):
    from pyspark.sql import functions as F

    return [
        (r.doc_id, r.text)
        for r in spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .filter(F.col("doc_id") < n)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    ]


def test_coverage_monitor_batch_parity(spark, tmp_path):
    rows = _doc_rows(spark)
    quarters = [rows[i : i + 15] for i in range(0, 60, 15)]
    store = str(tmp_path / "store")
    per_epoch = []
    for e, batch in enumerate(quarters):
        df = spark.createDataFrame(batch, SCHEMA.replace("bigint", "long"))
        per_epoch.append(
            coverage_monitor_batch(df, store, "doc_id", "text", epoch_id=e)
            .first()
        )

    # batch reference: the coverage curve over the same 60 docs —
    # re-derive per-doc n_new inline (the query runs on the full table)
    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.functions.similarity import (
        exploded_shingles,
    )

    d = spark.createDataFrame(rows, SCHEMA.replace("bigint", "long"))
    first = (
        exploded_shingles(d, "doc_id", "text", 3)
        .groupBy("shingle")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    n_new = {
        r.doc_id: r.c
        for r in first.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    }
    vocab = sum(n_new.values())
    for e, batch in enumerate(quarters):
        expect = sum(n_new.get(doc_id, 0) for doc_id, _ in batch)
        assert per_epoch[e].n_new == expect, f"epoch {e}"
        assert per_epoch[e].n_docs == len(batch)
    assert per_epoch[-1].vocab_size == vocab
    assert read_coverage_health(spark, store).first().vocab_size == vocab
    # novelty decays to < 1 once shingles repeat across docs
    assert per_epoch[0].novelty_rate == 1.0 or per_epoch[0].n_new == per_epoch[0].n_shingles


def test_coverage_monitor_replay_and_compaction(spark, tmp_path):
    rows = _doc_rows(spark)
    halves = [rows[:30], rows[30:]]
    store = str(tmp_path / "store")
    summaries = []
    for e, batch in enumerate(halves):
        df = spark.createDataFrame(batch, SCHEMA.replace("bigint", "long"))
        summaries.append(
            coverage_monitor_batch(df, store, "doc_id", "text", epoch_id=e)
            .first()
        )
    vocab = read_coverage_health(spark, store).first().vocab_size
    # replay the LAST epoch: identical summary, store unchanged
    df = spark.createDataFrame(halves[1], SCHEMA.replace("bigint", "long"))
    replay = coverage_monitor_batch(
        df, store, "doc_id", "text", epoch_id=1
    ).first()
    assert tuple(replay) == tuple(summaries[1])
    assert read_coverage_health(spark, store).first().vocab_size == vocab

    # compaction at a later epoch folds 0,1 into the base; verdicts
    # for a THIRD batch are unchanged
    df3 = spark.createDataFrame(
        [(9001, rows[0][1]), (9002, "zz unseen aa bb cc dd")],
        SCHEMA.replace("bigint", "long"),
    )
    before = coverage_monitor_batch(
        df3, store, "doc_id", "text", epoch_id=2
    ).first()
    compact_coverage_store(spark, store, 2)
    replay3 = coverage_monitor_batch(
        df3, store, "doc_id", "text", epoch_id=2
    ).first()
    assert tuple(replay3) == tuple(before)
    assert (
        read_coverage_health(spark, store).first().vocab_size
        == before.vocab_size
    )


def test_coverage_monitor_streaming_wrapper(spark, tmp_path):
    rows = _doc_rows(spark, n=40)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, chunk in enumerate([rows[:20], rows[20:]]):
        path = os.path.join(src, f"part-{i:03d}.json")
        with open(path, "w") as f:
            for doc_id, text in chunk:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        # spaced mtimes: same-timestamp files stream in nondeterministic
        # order (see test_streaming_pipeline._write_stream_files)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    q = start_coverage_monitor(
        spark, src, store, out, str(tmp_path / "ckpt"), SCHEMA,
        "doc_id", "text",
    )
    assert q.awaitTermination(600), "coverage monitor did not drain"
    got = spark.read.parquet(out)
    assert got.count() == 2
    total_new = sum(r.n_new for r in got.collect())
    assert read_coverage_health(spark, store).first().vocab_size == total_new
