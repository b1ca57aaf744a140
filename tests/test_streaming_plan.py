"""Streaming curation-plan refresher (streaming/plan.py): the live
twin of x_curation_plan. Pins:

1. below-capacity parity — on a duplicate-free corpus the epoch plan's
   per-source figures (n_occ exact, vocab/doc estimates exhaustive)
   and the mix_ppm allocation EQUAL the batch mix frame bit-for-bit;
2. duplicate trim — planted byte-copy duplicates of same-length docs
   reproduce the batch plan's exact-dedup trim (and the mix) exactly
   while still below capacity;
3. replay idempotence — re-running the last epoch reproduces the plan
   row set and leaves the cumulative estimates unchanged;
4. compaction — folding the stores mid-stream changes no figure;
5. estimation band — a tiny-kmv_k run over a stream that exceeds
   capacity tracks the exact per-source vocabulary within the KMV
   error bound and keeps the mix within the documented band;
6. funnel fold — with a pipeline funnel present, keep_fp is the
   cumulative survivor fraction and budget_tokens prices it.
"""

from __future__ import annotations

import os

from realtime_banking_cdc_pipeline_spark.streaming.plan import (
    _PLAN_S,
    compact_plan_stores,
    curation_plan_batch,
    read_plan,
)

SF = "/root/testdata/sf0.001"
SCHEMA = "doc_id bigint, source string, text string"


def _docs(spark):
    return (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
        .collect()
    )


def _batch_mix(spark, rows):
    from realtime_banking_cdc_pipeline_spark.queries.round13 import (
        _plan_base_sh,
        _plan_mix_from,
    )

    full = spark.createDataFrame(rows, SCHEMA)
    base, sh = _plan_base_sh(full)
    return {r.source: r for r in _plan_mix_from(base, sh).collect()}


def test_plan_parity_below_capacity(spark, tmp_path):
    rows = _docs(spark)
    root = str(tmp_path / "root")
    for e in range(4):
        df = spark.createDataFrame(rows[e * 125 : (e + 1) * 125], SCHEMA)
        curation_plan_batch(df, root, epoch_id=e)
    stream = {r.source: r for r in read_plan(spark, root, 3).collect()}
    batch = _batch_mix(spark, rows)
    assert set(stream) == set(batch)
    for s, b in batch.items():
        r = stream[s]
        assert r.n_docs == b.n_docs
        assert r.n_tokens == b.tokens_total
        assert r.n_occ == b.n_occ
        assert r.vocab_est == b.n_distinct  # exhaustive below capacity
        assert r.ddocs_est == b.n_docs      # duplicate-free corpus
        assert r.dup_fp == 0
        assert r.kept_tokens == b.kept_tokens
        assert r.share_fp == b.share_fp
        assert r.mix_ppm == b.mix_ppm
    assert sum(r.mix_ppm for r in stream.values()) == _PLAN_S
    # no funnel -> keep_fp = S, budget = total_kept
    any_row = next(iter(stream.values()))
    assert any_row.keep_fp == _PLAN_S
    assert any_row.budget_tokens == any_row.total_kept


def test_plan_dup_trim_matches_batch(spark, tmp_path):
    """Byte-copy duplicates of same-length docs: the streaming trim
    (docs - distinct docs, token-mass prorated) equals the batch
    plan's exact keep-first trim, so the whole plan stays bit-exact."""
    rows = []
    for i in range(10):
        rows.append((i, "a", f"a{i}x a{i}y a{i}z a{i}w"))
    for i in range(10, 14):
        rows.append((i, "a", rows[i - 10][2]))  # 4 byte-copies in 'a'
    for i in range(20, 30):
        rows.append((i, "b", f"b{i}x b{i}y b{i}z b{i}w"))
    root = str(tmp_path / "root")
    for e in range(2):
        df = spark.createDataFrame(rows[e * 12 : (e + 1) * 12], SCHEMA)
        curation_plan_batch(df, root, epoch_id=e)
    stream = {r.source: r for r in read_plan(spark, root, 1).collect()}
    batch = _batch_mix(spark, rows)
    a = stream["a"]
    assert a.ddocs_est == 10 and a.n_docs == 14
    assert a.dup_fp == (_PLAN_S * 4) // 14
    for s, b in batch.items():
        assert stream[s].kept_tokens == b.kept_tokens, s
        assert stream[s].mix_ppm == b.mix_ppm, s


def test_plan_replay_and_compaction(spark, tmp_path):
    rows = _docs(spark)
    root = str(tmp_path / "root")
    for e in range(3):
        df = spark.createDataFrame(rows[e * 100 : (e + 1) * 100], SCHEMA)
        curation_plan_batch(df, root, epoch_id=e)
    before = {
        r.source: tuple(r) for r in read_plan(spark, root, 2).collect()
    }
    # replay epoch 2: every figure reproduced bit-for-bit
    df2 = spark.createDataFrame(rows[200:300], SCHEMA)
    replay = {
        r.source: tuple(r)
        for r in curation_plan_batch(df2, root, epoch_id=2).collect()
    }
    assert replay == before
    # compaction folds strictly-earlier state; the next epoch's plan is
    # identical to an uncompacted twin run
    compact_plan_stores(spark, root, 3)
    df3 = spark.createDataFrame(rows[300:400], SCHEMA)
    compacted = {
        r.source: tuple(r)
        for r in curation_plan_batch(df3, root, epoch_id=3).collect()
    }
    twin = str(tmp_path / "twin")
    for e in range(4):
        df = spark.createDataFrame(rows[e * 100 : (e + 1) * 100], SCHEMA)
        curation_plan_batch(df, twin, epoch_id=e)
    uncompacted = {
        r.source: tuple(r) for r in read_plan(spark, twin, 3).collect()
    }
    assert compacted == uncompacted


def test_plan_estimation_band(spark, tmp_path):
    """Tiny kmv_k (256) against sources engineered with 4:2:1 distinct
    vocabulary: the per-source vocabulary estimate stays within the
    KMV bound (4/sqrt(k) ~ 25% at k=256; typical ~5%), the mix
    preserves the size ordering, and the ppm budget stays exact."""
    kmv_k = 256
    rows = []
    did = 0
    sizes = {"big": 2000, "mid": 1000, "small": 500}
    for src, n in sizes.items():
        for i in range(n):
            rows.append(
                (did, src, f"{src}{i}a {src}{i}b {src}{i}c {src}{i}d")
            )
            did += 1
    import hashlib

    rows.sort(
        key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest()
    )  # interleave sources deterministically
    root = str(tmp_path / "root")
    per = len(rows) // 4
    for e in range(4):
        df = spark.createDataFrame(rows[e * per : (e + 1) * per], SCHEMA)
        out = curation_plan_batch(df, root, epoch_id=e, kmv_k=kmv_k)
    stream = {r.source: r for r in out.collect()}
    batch = _batch_mix(spark, rows)
    for s, b in batch.items():
        r = stream[s]
        rel = abs(r.vocab_est - b.n_distinct) / b.n_distinct
        assert rel <= 4.0 / (kmv_k ** 0.5), (s, r.vocab_est, b.n_distinct)
        assert abs(r.mix_ppm - b.mix_ppm) <= 100_000, (
            s, r.mix_ppm, b.mix_ppm,
        )
    assert (
        stream["big"].mix_ppm > stream["mid"].mix_ppm
        > stream["small"].mix_ppm
    )
    assert sum(r.mix_ppm for r in stream.values()) == _PLAN_S


def test_plan_funnel_fold(spark, tmp_path):
    root = str(tmp_path / "root")
    # a pipeline funnel: 200 in, 150 kept cumulatively
    for e, (n_in, kept) in enumerate([(100, 80), (100, 70)]):
        spark.createDataFrame(
            [(n_in, kept)], "n_in bigint, n_semantic_kept bigint"
        ).write.mode("overwrite").parquet(
            os.path.join(root, "out", "funnel", f"epoch={e}")
        )
    rows = _docs(spark)[:200]
    for e in range(2):
        df = spark.createDataFrame(rows[e * 100 : (e + 1) * 100], SCHEMA)
        out = curation_plan_batch(df, root, epoch_id=e)
    row = out.first()
    assert row.keep_fp == (_PLAN_S * 150) // 200
    assert row.budget_tokens == (row.total_kept * row.keep_fp) // _PLAN_S


def test_pipeline_wires_plan_refresher(spark, tmp_path):
    """The composed pipeline runs the refresher on the RAW batch when
    plan_refresher_source is given (here an expression over doc_id for
    a corpus with no source field), lands the per-epoch plan in
    out/plan, and prices the budget with the funnel's cumulative
    survivor fraction."""
    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.streaming.pipeline import (
        pipeline_batch,
    )

    rows = _docs(spark)[:120]
    root = str(tmp_path / "root")
    src_expr = F.concat(
        F.lit("s"), F.pmod(F.col("doc_id"), F.lit(3)).cast("string")
    )
    for e in range(2):
        df = spark.createDataFrame(rows[e * 60 : (e + 1) * 60], SCHEMA)
        timings: dict = {}
        pipeline_batch(
            df.drop("source"),
            root,
            epoch_id=e,
            bloom_bits=1 << 20,
            with_paragraph_stage=False,
            plan_refresher_source=src_expr,
            timings=timings,
        )
        assert "plan" in timings
    plan = {r.source: r for r in read_plan(spark, root, 1).collect()}
    assert set(plan) == {"s0", "s1", "s2"}
    assert sum(r.mix_ppm for r in plan.values()) == _PLAN_S
    # keep_fp is the funnel's cumulative survivor fraction
    funnel = spark.read.parquet(os.path.join(root, "out", "funnel"))
    agg = funnel.agg(
        {"n_in": "sum", "n_semantic_kept": "sum"}
    ).first()
    expect = (_PLAN_S * int(agg["sum(n_semantic_kept)"])) // int(
        agg["sum(n_in)"]
    )
    assert next(iter(plan.values())).keep_fp == expect


def test_plan_drift_window_decays_stale_sources(spark, tmp_path):
    """drift_window=W: the live composition of the plan and the drift
    signal (the x_curation_plan_drift discipline over the monitor's
    recent novelty rows). A source that keeps re-sending its early
    vocabulary decays to drift_fp = S/2 and loses mix share relative
    to the undecayed plan; figures reconcile exactly with the novelty
    rows on disk; replay reproduces the row set."""
    rows = []
    for i in range(20):
        rows.append((i, "fresh", f"f{i}a f{i}b f{i}c f{i}d"))
        rows.append((100 + i, "stale", f"s{i}a s{i}b s{i}c s{i}d"))
    # epochs 1-3: fresh keeps introducing vocab, stale repeats epoch-0
    for e in range(1, 4):
        for i in range(20):
            rows.append(
                (1000 * e + i, "fresh", f"f{e}_{i}a f{e}_{i}b f{e}_{i}c f{e}_{i}d")
            )
            rows.append((1000 * e + 100 + i, "stale", rows[2 * i + 1][2]))
    per = 40
    root, twin = str(tmp_path / "root"), str(tmp_path / "twin")
    for e in range(4):
        df = spark.createDataFrame(rows[e * per : (e + 1) * per], SCHEMA)
        out = curation_plan_batch(df, root, epoch_id=e, drift_window=2)
        curation_plan_batch(df, twin, epoch_id=e)  # undecayed twin
    drifted = {r.source: r for r in out.collect()}
    static = {r.source: r for r in read_plan(spark, twin, 3).collect()}

    # reconciliation with the monitor rows on disk (last 2 epochs)
    import os as _os

    nov = (
        spark.read.parquet(_os.path.join(root, "out", "source_novelty"))
        .filter("epoch > 1 and epoch <= 3")
        .groupBy("source")
        .agg({"n_new": "sum", "n_shingles": "sum"})
        .collect()
    )
    recent = {r["source"]: (r["sum(n_new)"], r["sum(n_shingles)"]) for r in nov}
    for s, r in drifted.items():
        nn, ns = recent[s]
        assert (r.recent_new, r.recent_shingles) == (nn, ns), s
        fresh = (_PLAN_S * nn) // ns if ns else 0
        assert r.fresh_fp == fresh and r.drift_fp == (_PLAN_S + fresh) // 2
    # stale repeats its epoch-0 texts exactly -> zero recent novelty
    assert drifted["stale"].fresh_fp == 0
    assert drifted["stale"].drift_fp == _PLAN_S // 2
    assert drifted["stale"].mix_ppm < static["stale"].mix_ppm
    assert drifted["fresh"].mix_ppm > static["fresh"].mix_ppm
    assert sum(r.mix_ppm for r in drifted.values()) == _PLAN_S

    # replay: same epoch, same window, same rows
    df3 = spark.createDataFrame(rows[3 * per : 4 * per], SCHEMA)
    replay = {
        r.source: tuple(r)
        for r in curation_plan_batch(
            df3, root, epoch_id=3, drift_window=2
        ).collect()
    }
    assert replay == {s: tuple(r) for s, r in drifted.items()}


def test_pipeline_epoch_sample_executes_the_plan(spark, tmp_path):
    """plan_sample_per_epoch=N: each epoch's plan is executed on that
    epoch's gate SURVIVORS — quotas are the exact largest-remainder
    split of N over the epoch plan's mix_ppm, each source delivers
    min(quota, its survivors) by deterministic md5 rank, and the draw
    is replay-idempotent."""
    from collections import Counter

    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.streaming.pipeline import (
        pipeline_batch,
    )

    rows = _docs(spark)[:120]
    root = str(tmp_path / "root")
    src_expr = F.concat(
        F.lit("s"), F.pmod(F.col("doc_id"), F.lit(3)).cast("string")
    )
    N = 30
    # semantic_threshold near 1: the sf0.001 corpus's synthetic 8-dim
    # embeddings collide heavily at the default threshold (1 survivor
    # per epoch — correct gating, useless for exercising the draw)
    for e in range(2):
        df = spark.createDataFrame(rows[e * 60 : (e + 1) * 60], SCHEMA)
        timings: dict = {}
        pipeline_batch(
            df.drop("source"),
            root,
            epoch_id=e,
            bloom_bits=1 << 20,
            with_paragraph_stage=False,
            semantic_threshold=0.9999,
            plan_refresher_source=src_expr,
            plan_sample_per_epoch=N,
            timings=timings,
        )
        assert "sample" in timings
    plan = {r.source: r for r in read_plan(spark, root, 1).collect()}
    sample = spark.read.parquet(
        os.path.join(root, "out", "sample", "epoch=1")
    ).collect()
    # the quota law, recomputed from the epoch plan over ALL sources
    q0 = {s: (N * p.mix_ppm) // _PLAN_S for s, p in plan.items()}
    rem = {s: (N * p.mix_ppm) % _PLAN_S for s, p in plan.items()}
    d = N - sum(q0.values())
    bump = {
        s for s, _ in sorted(rem.items(), key=lambda kv: (-kv[1], kv[0]))[:d]
    }
    quota = {s: q0[s] + (1 if s in bump else 0) for s in plan}
    assert sum(quota.values()) == N
    for r in sample:
        assert r.src_quota == quota[r.source]
    # delivery = min(quota, the epoch's survivors of that source)
    surv = (
        spark.read.parquet(os.path.join(root, "out", "survivors", "epoch=1"))
        .select(src_expr.alias("source"))
        .collect()
    )
    by_src = Counter(r.source for r in surv)
    got = Counter(r.source for r in sample)
    assert sum(by_src.values()) > N  # gate must leave enough to draw from
    for s, q in quota.items():
        assert got[s] == min(q, by_src[s]), s
    # replay: the same epoch rewrites the identical sample
    df1 = spark.createDataFrame(rows[60:120], SCHEMA)
    pipeline_batch(
        df1.drop("source"),
        root,
        epoch_id=1,
        bloom_bits=1 << 20,
        with_paragraph_stage=False,
        semantic_threshold=0.9999,
        plan_refresher_source=src_expr,
        plan_sample_per_epoch=N,
    )
    again = {
        (r.doc_id, r.source, r.rk)
        for r in spark.read.parquet(
            os.path.join(root, "out", "sample", "epoch=1")
        ).collect()
    }
    assert again == {(r.doc_id, r.source, r.rk) for r in sample}
