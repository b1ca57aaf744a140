"""Round-14 pins: x_curation_plan_drift must RECONCILE with BOTH
parents — share_fp recomputed from x_curation_plan's kept_tokens,
freshness figures verbatim from x_source_drift — and its mix must be
the exact fixed-point largest-remainder allocation of the decayed
weights, summing to the ppm budget bit-exactly. A synthetic corpus
pins the DIRECTION: a source that stops contributing fresh vocabulary
loses mix share relative to the static plan."""

from __future__ import annotations

from realtime_banking_cdc_pipeline_spark.queries import QUERIES
from realtime_banking_cdc_pipeline_spark.queries.round13 import (
    _PLAN_B,
    _PLAN_S,
)

SF = "/root/testdata/sf0.01"


def test_drift_mix_reconciles_with_both_parents(spark):
    dm = {
        r.source: r
        for r in QUERIES["x_curation_plan_drift"].spark(spark, SF).collect()
    }
    plan = {
        r.source: r
        for r in QUERIES["x_curation_plan"].spark(spark, SF).collect()
    }
    sd = {
        r.source: r
        for r in QUERIES["x_source_drift"].spark(spark, SF).collect()
    }
    assert set(dm) == set(plan) == set(sd)

    total_kept = sum(p.kept_tokens for p in plan.values())
    w = {}
    for s, r in dm.items():
        # plan-parent figures, verbatim
        assert r.kept_tokens == plan[s].kept_tokens
        share = (_PLAN_S * r.kept_tokens) // total_kept
        assert r.share_fp == share
        # drift-parent figures, verbatim
        assert r.n_distinct_late == sd[s].n_distinct_late
        assert r.n_fresh_late == sd[s].n_fresh_late
        fresh = (
            (_PLAN_S * r.n_fresh_late) // r.n_distinct_late
            if r.n_distinct_late
            else 0
        )
        assert r.fresh_fp == fresh
        m = (_PLAN_S + fresh) // 2
        assert r.drift_fp == m
        assert _PLAN_S // 2 <= m <= _PLAN_S
        w[s] = (share * share // _PLAN_S) * m

    # the allocation is the exact largest-remainder split of the
    # decayed weights
    sw = sum(w.values())
    base = {s: (_PLAN_B * ww) // sw for s, ww in w.items()}
    rem = {s: (_PLAN_B * ww) % sw for s, ww in w.items()}
    d = _PLAN_B - sum(base.values())
    bump = {
        s for s, _ in sorted(rem.items(), key=lambda kv: (-kv[1], kv[0]))[:d]
    }
    for s, r in dm.items():
        assert r.mix_ppm == base[s] + (1 if s in bump else 0), s
    assert sum(r.mix_ppm for r in dm.values()) == _PLAN_B


def test_drift_mix_decays_stale_sources(spark, tmp_path):
    """Direction pin on a planted corpus: 'stale' keeps re-sending its
    early text in the late half (zero fresh late vocabulary) while
    'fresh' keeps introducing new vocabulary — the drift mix must move
    share from stale to fresh relative to the static plan."""
    docs = spark.createDataFrame(
        [
            (1, "stale", "s1a s1b s1c s1d s1e"),
            (2, "stale", "s2a s2b s2c s2d s2e"),
            (3, "fresh", "f1a f1b f1c f1d f1e"),
            (4, "fresh", "f2a f2b f2c f2d f2e"),
            # late half (split = (1 + 8 + 1) div 2 = 5)
            (5, "stale", "s1a s1b s1c s1d s1e"),
            (6, "stale", "s2a s2b s2c s2d s2e"),
            (7, "fresh", "f3a f3b f3c f3d f3e"),
            (8, "fresh", "f4a f4b f4c f4d f4e"),
        ],
        "doc_id bigint, source string, text string",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        sf_dir + "/documents.parquet"
    )
    static = {
        r.source: r.mix_ppm
        for r in QUERIES["x_curation_plan"].spark(spark, sf_dir).collect()
    }
    drifted = {
        r.source: r
        for r in QUERIES["x_curation_plan_drift"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert drifted["stale"].fresh_fp == 0
    assert drifted["stale"].drift_fp == _PLAN_S // 2
    assert drifted["fresh"].fresh_fp == _PLAN_S
    assert drifted["fresh"].drift_fp == _PLAN_S
    assert drifted["stale"].mix_ppm < static["stale"]
    assert drifted["fresh"].mix_ppm > static["fresh"]
    assert (
        drifted["stale"].mix_ppm + drifted["fresh"].mix_ppm == _PLAN_B
    )


def test_drift_sample_executes_the_drift_plan(spark):
    """x_curation_sample_drift delivers the drift mixture: quotas are
    the exact largest-remainder split of the budget over
    x_curation_plan_drift's mix_ppm, each source delivers
    min(quota, keepers) in deterministic md5 rank order, and where the
    drift mix moved share between sources the drawn quotas move with
    it."""
    from collections import Counter

    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.queries.round13 import (
        _SAMPLE_K,
    )

    sample = QUERIES["x_curation_sample_drift"].spark(spark, SF).collect()
    dm = {
        r.source: r
        for r in QUERIES["x_curation_plan_drift"].spark(spark, SF).collect()
    }
    quotas = {r.source: r.src_quota for r in sample}
    assert sum(quotas.values()) == _SAMPLE_K
    q0 = {s: (_SAMPLE_K * p.mix_ppm) // _PLAN_B for s, p in dm.items()}
    rem = {s: (_SAMPLE_K * p.mix_ppm) % _PLAN_B for s, p in dm.items()}
    d = _SAMPLE_K - sum(q0.values())
    bump = {
        s for s, _ in sorted(rem.items(), key=lambda kv: (-kv[1], kv[0]))[:d]
    }
    for s, q in quotas.items():
        assert q == q0[s] + (1 if s in bump else 0), s

    docs = (
        spark.read.parquet(SF + "/documents.parquet")
        .select(
            "doc_id", "source",
            F.md5(F.col("text").cast("binary")).alias("g"),
        )
        .collect()
    )
    keeper_of: dict = {}
    for r in docs:
        if r.g not in keeper_of or r.doc_id < keeper_of[r.g]:
            keeper_of[r.g] = r.doc_id
    keepers_by_src = Counter(
        r.source for r in docs if keeper_of[r.g] == r.doc_id
    )
    got_by_src = Counter(r.source for r in sample)
    for s, q in quotas.items():
        assert got_by_src[s] == min(q, keepers_by_src[s]), s


def test_allocation_zero_weight_fallback(spark):
    """r14 ADVICE / r15 guard: an all-zero weight frame (every drift
    weight floored to 0) must fall back to an EQUAL split that still
    sums to the budget bit-exactly — never NULL mix_ppm."""
    from realtime_banking_cdc_pipeline_spark.queries.round13 import (
        largest_remainder_ppm,
    )

    weighted = spark.createDataFrame(
        [(f"s{i:03d}", 0) for i in range(7)], "source string, __w bigint"
    )
    rows = largest_remainder_ppm(weighted, "__w").collect()
    assert all(r.mix_ppm is not None for r in rows)
    assert sum(r.mix_ppm for r in rows) == _PLAN_B
    # equal split: every source gets B div n, the first B % n
    # alphabetically get one more
    base, extra = divmod(_PLAN_B, 7)
    bump = {f"s{i:03d}" for i in range(extra)}
    for r in rows:
        assert r.mix_ppm == base + (1 if r.source in bump else 0), r.source


def test_drift_mix_many_small_sources(spark, tmp_path):
    """r14 ADVICE: >~1000 near-equal sources floor every drift weight
    (share_fp < 1000 -> share_fp^2 div S == 0) — the guarded
    allocation must yield the equal-split fallback with
    SUM(mix_ppm) == B and no NULLs, and the DuckDB oracle must agree
    row-for-row (Spark's non-ANSI div used to return NULLs here while
    the oracle errored)."""
    import duckdb

    n = 1100
    docs = spark.createDataFrame(
        [(i, f"src{i:04d}", f"w{i}a w{i}b w{i}c w{i}d w{i}e")
         for i in range(n)],
        "doc_id bigint, source string, text string",
    )
    pq = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.parquet(pq)

    got = {
        r.source: r
        for r in QUERIES["x_curation_plan_drift"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert len(got) == n
    assert all(r.mix_ppm is not None for r in got.values())
    assert sum(r.mix_ppm for r in got.values()) == _PLAN_B
    # every weight floored to zero -> equal split
    assert all(
        (r.share_fp * r.share_fp) // _PLAN_S * r.drift_fp == 0
        for r in got.values()
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    oracle = con.execute(QUERIES["x_curation_plan_drift"].oracle).df()
    assert len(oracle) == n
    assert int(oracle["mix_ppm"].sum()) == _PLAN_B
    om = dict(zip(oracle["source"], oracle["mix_ppm"]))
    for s, r in got.items():
        assert int(om[s]) == r.mix_ppm, s
