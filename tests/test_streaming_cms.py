"""Streaming Count-Min heavy-hitters store (streaming/metrics.py).

The contract under test is the ADDITIVE-state exactly-once story:
unlike HLL's idempotent max-merge, summing a replayed CMS batch twice
double-counts, so replay safety must come from the epoch layout
(partition-keyed overwrite) and reads must apply base subsumption
(newest committed base wins; subsumed leftovers are ignored, never
summed). Stream-fold ≡ batch-build parity is the headline invariant:
the streamed store's folded cells must EQUAL the cells the batch
x_cms_heavy_hitters query builds over the concatenated corpus.
"""

from __future__ import annotations

import json as _json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from realtime_banking_cdc_pipeline_spark.functions.sketches import (
    cms_cells,
    cms_estimates,
)
from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
    compact_cms_store,
    read_cms_hitters,
    read_cms_store,
    start_heavy_hitters_monitor,
    update_cms_store,
)

SF = "/root/testdata/sf0.001"

_TOKS = "filter(split(lower(trim(text)), ' +'), x -> x != '')"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )


def _terms(docs):
    return docs.select(F.explode(F.expr(_TOKS)).alias("term"))


def _cells_dict(df):
    return {(r.row_idx, r.col_idx): r.cnt for r in df.collect()}


def test_streamed_cms_store_matches_batch_sketch(spark, tmp_path):
    docs = _docs(spark).cache()
    batch_cells = _cells_dict(
        cms_cells(
            _terms(docs).groupBy("term").agg(F.count(F.lit(1)).alias("n")),
            "term",
            "n",
        )
    )

    store = str(tmp_path / "cms")
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, t in enumerate(thirds):
        update_cms_store(_terms(t), store, "term", epoch_id=i)
    assert _cells_dict(read_cms_store(spark, store)) == batch_cells

    # heavy-hitter estimates are one-sided (>= exact) for every tracked
    # candidate, and exact for the corpus's true top terms when their
    # cells are collision-free enough to agree with the batch sketch
    exact = {
        r.term: r.n
        for r in _terms(docs)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    hitters = {
        r.term: r.cms_estimate
        for r in read_cms_hitters(spark, store).collect()
    }
    assert hitters, "candidate store must track terms"
    assert all(est >= exact[t] for t, est in hitters.items())

    # a replayed batch overwrites its own partition: fold unchanged
    update_cms_store(_terms(thirds[1]), store, "term", epoch_id=1)
    assert _cells_dict(read_cms_store(spark, store)) == batch_cells
    docs.unpersist()


def test_cms_compaction_base_subsumption(spark, tmp_path):
    """Compaction folds strictly-earlier partitions; leftover subsumed
    partitions (crash mid-delete) are IGNORED on read, not summed —
    the double-count hazard unique to additive sketch state."""
    docs = _docs(spark).cache()
    store = str(tmp_path / "cms")
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, t in enumerate(thirds):
        update_cms_store(_terms(t), store, "term", epoch_id=i)
    whole = _cells_dict(read_cms_store(spark, store))

    compact_cms_store(spark, store, epoch_id=2)
    eps = sorted(
        int(d.split("=")[1])
        for d in os.listdir(store)
        if d.startswith("epoch=")
    )
    assert eps == [-2, 2]
    assert _cells_dict(read_cms_store(spark, store)) == whole

    # replayed compaction: committed base untouched
    sentinel = os.path.join(store, "epoch=-2", "_sentinel")
    open(sentinel, "w").close()
    compact_cms_store(spark, store, epoch_id=2)
    assert os.path.exists(sentinel)

    # crash-mid-delete debris: re-materialize a subsumed batch
    # partition next to the base — the fold must NOT change
    update_cms_store(_terms(thirds[0]), store, "term", epoch_id=0)
    assert _cells_dict(read_cms_store(spark, store)) == whole
    # and the next compaction clears the debris
    compact_cms_store(spark, store, epoch_id=3)
    eps = sorted(
        int(d.split("=")[1])
        for d in os.listdir(store)
        if d.startswith("epoch=")
    )
    assert eps == [-3]
    assert _cells_dict(read_cms_store(spark, store)) == whole
    docs.unpersist()


def test_heavy_hitters_monitor_stream_wiring(spark, tmp_path):
    """Real readStream/foreachBatch wiring with per-batch compaction:
    the drained store's estimates match the batch sketch probed at the
    same candidates."""
    docs = _docs(spark).cache()
    rows = docs.collect()
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        with open(src / f"part-{i}.json", "w") as f:
            for r in rows[i::3]:
                f.write(_json.dumps({"text": r.text}) + "\n")
    schema = StructType([StructField("text", StringType())])
    store = str(tmp_path / "cms")
    q = start_heavy_hitters_monitor(
        spark, str(src), store, str(tmp_path / "ckpt"), schema,
        terms_expr=_TOKS, compact_every=2,
    )
    q.awaitTermination(120)

    batch_cells = cms_cells(
        _terms(docs).groupBy("term").agg(F.count(F.lit(1)).alias("n")),
        "term",
        "n",
    )
    streamed = {
        r.term: r.cms_estimate
        for r in read_cms_hitters(spark, store).collect()
    }
    assert streamed
    cand = read_cms_hitters(spark, store).select("term")
    batch_est = {
        r.term: r.cms_estimate
        for r in cms_estimates(batch_cells, cand).collect()
    }
    assert streamed == batch_est
    # compaction ran mid-stream: bounded partition count
    eps = [d for d in os.listdir(store) if d.startswith("epoch=")]
    assert len(eps) <= 3
    docs.unpersist()
