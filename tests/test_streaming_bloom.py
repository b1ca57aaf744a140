"""Streaming seen-set Bloom dedup gate (streaming/metrics.py).

The third exactly-once class: Bloom words OR-merge idempotently (the
HLL regime — replay folds to the identical filter; epoch partitions
are crash safety only). Invariants under test: stream-fold ≡ batch
filter over the concatenated corpus, one-sided gating (every true
cross-batch repeat flagged; false-positive rate bounded on the
fixture), replay idempotence of the store, and compaction parity.
"""

from __future__ import annotations

import json as _json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from realtime_banking_cdc_pipeline_spark.functions.sketches import (
    bloom_maybe_member,
    bloom_words,
)
from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
    bloom_gate_batch,
    compact_bloom_store,
    read_bloom_store,
    start_bloom_dedup_gate,
)


def _words_dict(df):
    return {r.word_idx: r.bits for r in df.collect()}


def _mk_batches(spark):
    """Three batches; batch texts overlap earlier batches on purpose."""
    b0 = [(i, f"text number {i}") for i in range(40)]
    b1 = [(100 + i, f"text number {i}") for i in range(10)] + [
        (200 + i, f"fresh batch-1 {i}") for i in range(30)
    ]
    b2 = [(300 + i, f"fresh batch-1 {i}") for i in range(5)] + [
        (400 + i, f"fresh batch-2 {i}") for i in range(30)
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(b0), mk(b1), mk(b2)


def test_bloom_gate_one_sided_and_store_parity(spark, tmp_path):
    b0, b1, b2 = _mk_batches(spark)
    store = str(tmp_path / "bloom")

    f0 = {r.doc_id: r.maybe_seen for r in
          bloom_gate_batch(b0, store, "doc_id", "text", epoch_id=0).collect()}
    f1 = {r.doc_id: r.maybe_seen for r in
          bloom_gate_batch(b1, store, "doc_id", "text", epoch_id=1).collect()}
    f2 = {r.doc_id: r.maybe_seen for r in
          bloom_gate_batch(b2, store, "doc_id", "text", epoch_id=2).collect()}

    # one-sided guarantee: every true cross-batch repeat is flagged
    assert all(f1[100 + i] for i in range(10))
    assert all(f2[300 + i] for i in range(5))
    # batch 0 probed an empty store: nothing flagged
    assert not any(f0.values())
    # fp rate on fresh text stays small on this fixture (4096 bits,
    # ~80 distinct texts inserted -> expected fp << 10%)
    fresh_flags = [f1[200 + i] for i in range(30)] + [
        f2[400 + i] for i in range(30)
    ]
    assert sum(fresh_flags) <= 3

    # store parity: streamed fold == batch filter over all three
    batch_filter = _words_dict(
        bloom_words(b0.unionByName(b1).unionByName(b2), "text")
    )
    assert _words_dict(read_bloom_store(spark, store)) == batch_filter

    # replay idempotence: re-running epoch 1 leaves the store identical
    bloom_gate_batch(b1, store, "doc_id", "text", epoch_id=1)
    assert _words_dict(read_bloom_store(spark, store)) == batch_filter

    # compaction parity + leftover tolerance (idempotent OR)
    compact_bloom_store(spark, store, epoch_id=2)
    assert _words_dict(read_bloom_store(spark, store)) == batch_filter
    bloom_words(b0, "text").write.mode("overwrite").parquet(
        os.path.join(store, "epoch=0")
    )
    assert _words_dict(read_bloom_store(spark, store)) == batch_filter


def test_bloom_gate_stream_wiring(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [{"doc_id": i, "text": f"stream doc {i % 150}"} for i in range(300)]
    for i in range(3):
        p = src / f"part{i}.json"
        with open(p, "w") as f:
            for r in rows[i * 100 : (i + 1) * 100]:
                f.write(_json.dumps(r) + "\n")
        # the file source orders by mtime; same-second writes tie and
        # batches can arrive out of order — pin distinct mtimes so the
        # "repeats come after originals" fixture assumption holds
        os.utime(p, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    store = str(tmp_path / "bloom")
    out = str(tmp_path / "out")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    q = start_bloom_dedup_gate(
        spark, str(src), store, out, str(tmp_path / "ckpt"), schema,
        "doc_id", "text", compact_every=2,
    )
    q.awaitTermination(120)

    flags = {
        r.doc_id: r.maybe_seen for r in spark.read.parquet(out).collect()
    }
    assert len(flags) == 300
    # docs 150..299 repeat docs 0..149 from earlier batches (files sort
    # part0<part1<part2, one file per trigger) -> all flagged
    assert all(flags[i] for i in range(150, 300))
    # the whole-stream filter equals the batch filter
    batch_filter = _words_dict(
        bloom_words(
            spark.createDataFrame(
                [(r["doc_id"], r["text"]) for r in rows],
                "doc_id long, text string",
            ),
            "text",
        )
    )
    assert _words_dict(read_bloom_store(spark, store)) == batch_filter


def test_shared_salt_scheme_matches_batch_query_filter(spark):
    """The streaming gate's bloom_words must build the EXACT filter the
    batch decontamination query builds inline (same 'bloom{i}:{text}'
    salt, same 28-bit positions, same 32-bit words) — pinned via the
    DuckDB oracle CTE from x_bloom_decontaminate on the same texts."""
    import duckdb

    texts = [(f"doc number {i}",) for i in range(50)]
    got = {
        r.word_idx: r.bits
        for r in bloom_words(
            spark.createDataFrame(texts, "text string"), "text"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t[0]}')" for t in texts)
        + ") AS v(text)"
    )
    want = {
        int(r[0]): int(r[1])
        for r in con.execute("""
            WITH bpos AS (
              SELECT DISTINCT
                CAST('0x' || substr(md5('bloom' || CAST(i AS VARCHAR)
                                        || ':' || text), 1, 7) AS BIGINT)
                  % 4096 AS pos
              FROM t, unnest(generate_series(0, 3)) AS u(i)
            )
            SELECT pos // 32 AS word_idx,
                   bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER))
                     AS bits
            FROM bpos GROUP BY 1
        """).fetchall()
    }
    assert got == want


def test_sized_filter_controls_fp_rate(spark, tmp_path):
    """bits is a real parameter: a 2^16-bit filter over 2000 inserted
    texts keeps the fresh-text fp rate ~0 where the 4096-bit default
    would saturate (2000 texts * 4 hashes ~ 8000 set bits > 4096)."""
    seen = spark.createDataFrame(
        [(i, f"seen text {i}") for i in range(2000)], "doc_id long, text string"
    )
    fresh = spark.createDataFrame(
        [(10_000 + i, f"fresh text {i}") for i in range(2000)],
        "doc_id long, text string",
    )
    big, small = str(tmp_path / "big"), str(tmp_path / "small")
    bloom_gate_batch(seen, big, "doc_id", "text", epoch_id=0, bits=1 << 16)
    bloom_gate_batch(seen, small, "doc_id", "text", epoch_id=0)

    fp_big = sum(
        r.maybe_seen
        for r in bloom_gate_batch(
            fresh, big, "doc_id", "text", epoch_id=1, bits=1 << 16
        ).collect()
    )
    import pytest

    from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
        BloomSaturationWarning,
    )

    # the overloaded probe is exactly the state the r11 detector exists
    # for — the warning firing here is part of the contract
    with pytest.warns(BloomSaturationWarning):
        fp_small = sum(
            r.maybe_seen
            for r in bloom_gate_batch(
                fresh, small, "doc_id", "text", epoch_id=1
            ).collect()
        )
    assert fp_big <= 20   # ~1% bound at 10x sizing
    # the overloaded default: fill = 1-e^(-8000/4096) ~ 86% per bit,
    # fp ~ 0.86^4 ~ 55% — assert it is catastrophically worse
    assert fp_small >= 800


def test_replayed_batch_flags_are_exactly_once(spark, tmp_path):
    """The r8-ADVICE medium: a replayed micro-batch must reproduce its
    ORIGINAL verdicts, not flag every row maybe_seen (which would make
    a downstream maybe_seen filter drop the whole replayed batch). The
    probe horizon is epoch < epoch_id, so a replay never sees its own
    words — including when the replayed epoch IS a compaction trigger
    (the strictly-earlier fold keeps its words out of the base)."""
    b0, b1, b2 = _mk_batches(spark)
    store = str(tmp_path / "bloom")

    def run(df, e):
        return {
            r.doc_id: r.maybe_seen
            for r in bloom_gate_batch(
                df, store, "doc_id", "text", epoch_id=e, compact_every=2
            ).collect()
        }

    # the realistic crash window is the LAST uncommitted batch: batch e
    # replays only before batch e+1 starts (checkpoint commit order),
    # so each epoch is replayed immediately after its first run —
    # including epoch 2, the compaction trigger, replayed AFTER its
    # strictly-earlier fold ran (its words must not be in the base)
    f0 = run(b0, 0)
    assert run(b0, 0) == f0
    f1 = run(b1, 1)
    assert run(b1, 1) == f1
    f2 = run(b2, 2)  # triggers compaction at epoch 2
    assert run(b2, 2) == f2
    # and the epoch-0 probe saw an EMPTY horizon: no flags
    assert not any(f0.values())
    # store still folds to the batch filter afterwards
    batch_filter = _words_dict(
        bloom_words(b0.unionByName(b1).unionByName(b2), "text")
    )
    assert _words_dict(read_bloom_store(spark, store)) == batch_filter


def test_bloom_maybe_member_tolerates_duplicate_rows(spark):
    """r8-ADVICE low: duplicate (id, text) probe rows must not break
    the one-sided guarantee (sum(set_bit) = 2k != k would report a
    genuinely seen text as maybe_member=false)."""
    seen = spark.createDataFrame(
        [(i, f"dup-guard text {i}") for i in range(20)],
        "doc_id long, text string",
    )
    words = bloom_words(seen, "text")
    probe = seen.unionByName(seen)  # every row duplicated
    flags = {
        r.doc_id: r.maybe_member
        for r in bloom_maybe_member(probe, "doc_id", "text", words).collect()
    }
    assert len(flags) == 20 and all(flags.values())


def test_bloom_saturation_is_loud_not_silent(spark, tmp_path):
    """ADVICE r10: a saturated filter one-sidedly flags EVERY fresh doc
    maybe_seen — silent total data loss for a gate built on the flags.
    Drive a deliberately tiny filter to saturation and pin that the
    condition is explicitly reported: a BloomSaturationWarning fires
    and the gate output carries bloom_fill_frac / bloom_est_fp ~ 1."""
    import warnings as _warnings

    import pytest

    from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
        BloomSaturationWarning,
    )

    store = str(tmp_path / "tiny")
    seed = spark.createDataFrame(
        [(i, f"seen text {i}") for i in range(200)], "doc_id long, text string"
    )
    # epoch 0 probes an empty filter: fresh batch, no warning
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", BloomSaturationWarning)
        f0 = bloom_gate_batch(
            seed, store, "doc_id", "text", epoch_id=0, bits=64, k=4
        ).collect()
    assert all(r.bloom_est_fp == 0.0 for r in f0)

    # epoch 1: 200 distinct keys went into a 64-bit filter — saturated.
    fresh = spark.createDataFrame(
        [(1000 + i, f"totally fresh {i}") for i in range(50)],
        "doc_id long, text string",
    )
    with pytest.warns(BloomSaturationWarning, match="saturated"):
        f1 = bloom_gate_batch(
            fresh, store, "doc_id", "text", epoch_id=1, bits=64, k=4
        ).collect()
    # the saturation is explicit data, not a doc caveat
    assert all(r.bloom_est_fp > 0.5 for r in f1)
    assert all(r.bloom_fill_frac > 0.8 for r in f1)
    # and the flags themselves show the failure mode it names
    assert sum(r.maybe_seen for r in f1) >= 45


def test_sketch_health_read_paths(spark, tmp_path):
    """r10 directive #8: every sketch store exposes estimated fill /
    error as data. Parity-style checks: bloom est_distinct inverts to
    ~the true inserted distinct count, HLL fill reflects register
    occupancy, CMS total_count recovers exact stream mass (additive
    cells / depth), DDS totals match row count."""
    from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
        read_bloom_health,
        read_cms_health,
        read_dds_health,
        read_hll_health,
        update_cms_store,
        update_dds_store,
        update_hll_store,
    )

    docs = spark.createDataFrame(
        [(i, f"health text {i % 150}") for i in range(600)],
        "doc_id long, text string",
    )

    bloom_store = str(tmp_path / "bh")
    bloom_gate_batch(
        docs.dropDuplicates(["text"]), bloom_store, "doc_id", "text",
        epoch_id=0, bits=4096, k=4,
    )
    bh = read_bloom_health(spark, bloom_store, bits=4096, k=4).first()
    assert 0 < bh.fill_frac < 0.5
    assert 0 <= bh.est_fp < 0.05
    # occupancy inversion lands near the true 150 distinct keys
    assert 100 <= bh.est_distinct <= 200

    hll_store = str(tmp_path / "hh")
    update_hll_store(
        docs.withColumn("metric", F.lit("docs")), hll_store,
        "metric", "text", epoch_id=0,
    )
    hh = {r.key: r for r in read_hll_health(spark, hll_store).collect()}
    assert 0 < hh["docs"].fill_frac <= 1.0
    assert hh["docs"].registers_set <= 64

    cms_store = str(tmp_path / "ch")
    update_cms_store(
        docs.select(F.col("text").alias("term")), cms_store, "term",
        epoch_id=0,
    )
    ch = read_cms_health(spark, cms_store).first()
    assert ch.total_count == 600  # additive cells / CMS_D = exact mass
    assert 0 < ch.fill_frac <= 1.0
    assert ch.err_bound > 0

    dds_store = str(tmp_path / "dh")
    update_dds_store(
        docs.select(F.col("doc_id").alias("v")), dds_store, "v", epoch_id=0
    )
    dh = read_dds_health(spark, dds_store).first()
    assert dh.total_count == 600
    assert dh.n_bins > 0


def test_bloom_health_missing_and_rowless_store(spark, tmp_path):
    """ADVICE r11: the ops read path must report an EMPTY filter for a
    missing or all-rowless store (the states the ingest-side guards
    were added for) instead of crashing on schema inference."""
    from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
        read_bloom_health,
    )

    missing = str(tmp_path / "never_written")
    h = read_bloom_health(spark, missing).first()
    assert h.set_bits == 0 and h.fill_frac == 0.0 and h.est_fp == 0.0

    # all-rowless: epoch partitions exist but hold only _SUCCESS
    rowless = str(tmp_path / "rowless")
    os.makedirs(os.path.join(rowless, "epoch=0"))
    open(os.path.join(rowless, "epoch=0", "_SUCCESS"), "w").close()
    h = read_bloom_health(spark, rowless).first()
    assert h.set_bits == 0 and h.fill_frac == 0.0

    assert read_bloom_store(spark, rowless).count() == 0


def test_bloom_gate_after_rowless_epoch(spark, tmp_path):
    """An empty micro-batch leaves a rowless epoch partition; the next
    batch's probe must treat the store as empty, not crash (and the
    gate's fold is materialized once — behavioral pin is the verdict)."""
    store = str(tmp_path / "store")
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    bloom_gate_batch(empty, store, "doc_id", "text", epoch_id=0)
    batch = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, text string"
    )
    flags = {r.doc_id: r.maybe_seen for r in bloom_gate_batch(
        batch, store, "doc_id", "text", epoch_id=1
    ).collect()}
    assert flags == {1: False, 2: False}
    # and a true repeat in a later epoch is still flagged
    rep = spark.createDataFrame([(3, "alpha")], "doc_id bigint, text string")
    f2 = bloom_gate_batch(rep, store, "doc_id", "text", epoch_id=2).first()
    assert bool(f2.maybe_seen) is True
