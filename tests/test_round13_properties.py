"""Round-13 pins: the x_curation_plan capstone must RECONCILE with the
standalone r12 decision-layer queries it composes — same trim figures
as x_dedup_source_report, same novelty/redundancy as x_source_novelty,
a knee consistent with x_ngram_coverage_curve, and an exact
largest-remainder ppm mix (the x_temperature_mix discipline)."""

from __future__ import annotations

import math

from realtime_banking_cdc_pipeline_spark.queries import QUERIES
from realtime_banking_cdc_pipeline_spark.queries.round13 import (
    _PLAN_B,
    _PLAN_S,
)

SF = "/root/testdata/sf0.01"


def test_curation_plan_reconciles_with_inputs(spark):
    plan = {r.source: r for r in QUERIES["x_curation_plan"].spark(spark, SF).collect()}
    nov = {r.source: r for r in QUERIES["x_source_novelty"].spark(spark, SF).collect()}
    rep = {r.source: r for r in QUERIES["x_dedup_source_report"].spark(spark, SF).collect()}
    assert set(plan) == set(nov) == set(rep)

    # exact-dedup trim figures come from the dedup report, verbatim
    for s, p in plan.items():
        assert p.n_docs == rep[s].n_docs
        assert p.tokens_total == rep[s].tokens_total
        assert p.tokens_dup == rep[s].tokens_dup
        # novelty attribution comes from x_source_novelty, verbatim
        assert p.owned_frac == nov[s].owned_frac
        assert p.redundancy == nov[s].redundancy
        # kept_tokens: trim exact dups then downsample by the exact
        # fixed-point distinct/occurrence rational — never more than
        # the post-dedup mass, never negative
        ratio_fp = (_PLAN_S * nov[s].n_distinct) // nov[s].n_occ
        assert p.kept_tokens == (
            (p.tokens_total - p.tokens_dup) * ratio_fp
        ) // _PLAN_S
        assert 0 <= p.kept_tokens <= p.tokens_total - p.tokens_dup
        assert p.keep_frac == p.kept_tokens / p.tokens_total
        assert 0.0 <= p.keep_frac <= 1.0

    # the ppm mix is an exact largest-remainder allocation: sums to
    # the budget bit-exactly and is monotone in kept-share^2
    assert sum(p.mix_ppm for p in plan.values()) == _PLAN_B
    total_kept = sum(p.kept_tokens for p in plan.values())
    by_kept = sorted(plan.values(), key=lambda p: p.kept_tokens)
    for lo, hi in zip(by_kept, by_kept[1:]):
        assert lo.mix_ppm <= hi.mix_ppm + 1  # remainder unit may flip order by 1

    # the knee scalars are global (identical on every row) and price
    # the budget: budget_tokens = floor(knee_frac * total_kept)
    fracs = {p.knee_frac for p in plan.values()}
    assert len(fracs) == 1
    knee_frac = fracs.pop()
    assert 0.0 < knee_frac <= 1.0
    budget = {p.budget_tokens for p in plan.values()}
    assert budget == {int(math.floor(knee_frac * total_kept))}


def test_curation_plan_knee_matches_coverage_curve(spark):
    curve = (
        QUERIES["x_ngram_coverage_curve"].spark(spark, SF)
        .orderBy("doc_id")
        .collect()
    )
    total = curve[-1].cum_new
    need = (19 * total + 19) // 20
    knee_doc = min(r.doc_id for r in curve if r.cum_new >= need)
    n_before = sum(1 for r in curve if r.doc_id <= knee_doc)
    expected = n_before / len(curve)
    got = QUERIES["x_curation_plan"].spark(spark, SF).first().knee_frac
    assert got == expected


def test_curation_sample_executes_the_plan(spark):
    """x_curation_sample must deliver exactly the plan's mixture: the
    per-source quotas are a largest-remainder split of the 500-doc
    budget over mix_ppm (sum == 500 bit-exactly), and each source
    delivers min(quota, its keeper count) rows in deterministic md5
    rank order."""
    from collections import Counter

    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.queries.round13 import _SAMPLE_K

    sample = QUERIES["x_curation_sample"].spark(spark, SF).collect()
    plan = {r.source: r for r in QUERIES["x_curation_plan"].spark(spark, SF).collect()}

    quotas = {r.source: r.src_quota for r in sample}
    assert sum(quotas.values()) == _SAMPLE_K
    # quota is the largest-remainder split of _SAMPLE_K over mix_ppm
    q0 = {s: (_SAMPLE_K * p.mix_ppm) // 1_000_000 for s, p in plan.items()}
    rem = {s: (_SAMPLE_K * p.mix_ppm) % 1_000_000 for s, p in plan.items()}
    d = _SAMPLE_K - sum(q0.values())
    bump = {
        s for s, _ in sorted(rem.items(), key=lambda kv: (-kv[1], kv[0]))[:d]
    }
    for s, q in quotas.items():
        assert q == q0[s] + (1 if s in bump else 0), s

    # per-source delivery = min(quota, keepers); every sampled doc is
    # a keeper (its text's min-doc_id representative)
    docs = (
        spark.read.parquet(SF + "/documents.parquet")
        .select("doc_id", "source", F.md5(F.col("text").cast("binary")).alias("g"))
        .collect()
    )
    keeper_of = {}
    for r in docs:
        if r.g not in keeper_of or r.doc_id < keeper_of[r.g]:
            keeper_of[r.g] = r.doc_id
    keepers_by_src = Counter(
        r.source for r in docs if keeper_of[r.g] == r.doc_id
    )
    got_by_src = Counter(r.source for r in sample)
    keeper_ids = set(keeper_of.values())
    assert all(r.doc_id in keeper_ids for r in sample)
    for s, q in quotas.items():
        assert got_by_src[s] == min(q, keepers_by_src[s]), s


def test_knee_sweep_monotone_and_matches_plan(spark):
    """The knee sweep must be monotone in the coverage target (a higher
    target can never need a SHORTER prefix), and its 95% row must equal
    the single knee x_curation_plan prices its budget with."""
    rows = sorted(
        QUERIES["x_coverage_knee_sweep"].spark(spark, SF).collect(),
        key=lambda r: r.pct,
    )
    assert [r.pct for r in rows] == [50, 80, 90, 95, 99]
    for lo, hi in zip(rows, rows[1:]):
        assert lo.knee_doc <= hi.knee_doc
        assert lo.n_before <= hi.n_before
        assert lo.knee_frac <= hi.knee_frac
    plan_frac = QUERIES["x_curation_plan"].spark(spark, SF).first().knee_frac
    assert {r.knee_frac for r in rows if r.pct == 95} == {plan_frac}


def test_source_drift_sanity_and_reconciliation(spark):
    """x_source_drift: per source, fresh late vocabulary is a subset of
    its late vocabulary (0 <= fresh_frac <= 1); doc counts partition
    the corpus at the arrival midpoint; and the UNION of fresh late
    shingles equals the late vocabulary minus the early vocabulary
    (cross-checked with a plain recomputation)."""
    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.functions.similarity import (
        _shingles_from_tokens,
    )
    from realtime_banking_cdc_pipeline_spark.functions.text import ws_tokens

    rows = QUERIES["x_source_drift"].spark(spark, SF).collect()
    d = spark.read.parquet(SF + "/documents.parquet")
    lo, hi, n = d.agg(
        F.min("doc_id"), F.max("doc_id"), F.count("*")
    ).first()
    split = (lo + hi + 1) // 2
    assert sum(r.n_docs_early + r.n_docs_late for r in rows) == n
    for r in rows:
        assert 0 <= r.n_fresh_late <= r.n_distinct_late
        assert 0.0 <= r.fresh_frac <= 1.0
        if r.n_distinct_late:
            assert r.fresh_frac == r.n_fresh_late / r.n_distinct_late

    sh = d.select(
        "doc_id", "source",
        F.explode(_shingles_from_tokens(ws_tokens(F.col("text")), 3)).alias("s"),
    )
    early = {
        r.s for r in sh.filter(F.col("doc_id") < split).select("s").distinct().collect()
    }
    late_pairs = {
        (r.source, r.s)
        for r in sh.filter(F.col("doc_id") >= split)
        .select("source", "s")
        .distinct()
        .collect()
    }
    fresh_by_src: dict = {}
    for src, s in late_pairs:
        if s not in early:
            fresh_by_src[src] = fresh_by_src.get(src, 0) + 1
    for r in rows:
        assert r.n_fresh_late == fresh_by_src.get(r.source, 0), r.source


def test_plan_mix_keeps_shingle_free_sources_visible(spark):
    """r13 ADVICE closure: if a source contributes NO fan-out rows,
    the mix frame must keep it VISIBLE (left join) with n_occ =
    n_distinct = kept_tokens = mix_ppm = 0 instead of silently
    dropping it — and the ppm budget must still sum exactly over the
    full source set. (With the CURRENT house shingle convention the
    drop cannot actually occur — even an empty doc pads to one
    empty-string shingle, asserted below — so this pins the mix
    frame's robustness against any future tokenizer/fan-out change,
    simulated by filtering one source out of the fan-out.)"""
    from realtime_banking_cdc_pipeline_spark.queries.round13 import (
        _plan_base_sh,
        _plan_mix_from,
    )

    docs = spark.createDataFrame(
        [
            (1, "a", "alpha beta gamma delta"),
            (2, "a", "alpha beta gamma delta epsilon"),
            (3, "tiny", ""),
            (4, "tiny", "   "),
        ],
        "doc_id bigint, source string, text string",
    )
    base, sh = _plan_base_sh(docs)
    # the padding convention: zero-token docs still emit one shingle
    assert sh.filter(sh.source == "tiny").count() == 2
    sh_missing = sh.filter(sh.source != "tiny")
    mix = {r.source: r for r in _plan_mix_from(base, sh_missing).collect()}
    assert set(mix) == {"a", "tiny"}
    t = mix["tiny"]
    assert (t.n_occ, t.n_distinct, t.kept_tokens, t.mix_ppm) == (0, 0, 0, 0)
    assert t.n_docs == 2 and t.tokens_total == 0 and t.tokens_dup == 0
    assert sum(r.mix_ppm for r in mix.values()) == _PLAN_B
