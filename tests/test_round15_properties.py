"""Round-15 pins: plan-driven admission. The batch rates must obey the
bounded law exactly (recomputed from the plan's own share_fp/mix_ppm),
the batch and streaming twins must share the floor constant and agree
on the rate frame for the same plan, and the one-step feedback
simulation must steer every decayed source's raw share DOWN (the md5
draw is deterministic, so direction is exact, not statistical)."""

from __future__ import annotations

from realtime_banking_cdc_pipeline_spark.queries import QUERIES
from realtime_banking_cdc_pipeline_spark.queries.round13 import _PLAN_S

SF = "/root/testdata/sf0.01"


def test_admission_floor_constants_agree():
    from realtime_banking_cdc_pipeline_spark.queries.round15 import (
        _ADMIT_FLOOR_FP as batch_floor,
    )
    from realtime_banking_cdc_pipeline_spark.streaming.plan import (
        _ADMIT_FLOOR_FP as live_floor,
    )

    assert batch_floor == live_floor


def test_admission_rates_obey_the_law(spark):
    from realtime_banking_cdc_pipeline_spark.queries.round15 import (
        _ADMIT_FLOOR_FP,
    )

    rows = {
        r.source: r
        for r in QUERIES["x_curation_admission"].spark(spark, SF).collect()
    }
    plan = {
        r.source: r
        for r in QUERIES["x_curation_plan"].spark(spark, SF).collect()
    }
    assert set(rows) == set(plan)
    mix = {
        r.source: r
        for r in QUERIES["x_curation_plan_drift"].spark(spark, SF).collect()
    }
    for s, r in rows.items():
        # share/mix figures verbatim from the static plan family
        assert r.mix_ppm == plan[s].mix_ppm
        assert r.share_fp == mix[s].share_fp
        if r.share_fp <= r.mix_ppm:
            assert r.rate_fp == _PLAN_S, s
        else:
            assert r.rate_fp == max(
                _ADMIT_FLOOR_FP, (_PLAN_S * r.mix_ppm) // r.share_fp
            ), s
        assert _ADMIT_FLOOR_FP <= r.rate_fp <= _PLAN_S
        assert 0 <= r.n_admitted <= r.n_docs
        # rate == S admits every doc, deterministically
        if r.rate_fp == _PLAN_S:
            assert r.n_admitted == r.n_docs, s


def test_batch_and_live_rates_agree(spark):
    """streaming/plan.py:admission_rates over a frame carrying the
    batch plan's (source, share_fp, mix_ppm) must equal the batch
    query's rate_fp — one law, two deployment shapes."""
    from pyspark.sql import functions as F  # noqa: F401

    from realtime_banking_cdc_pipeline_spark.streaming.plan import (
        admission_rates,
    )

    batch = {
        r.source: r.rate_fp
        for r in QUERIES["x_curation_admission"].spark(spark, SF).collect()
    }
    plan_frame = (
        QUERIES["x_curation_admission"]
        .spark(spark, SF)
        .select("source", "share_fp", "mix_ppm")
    )
    live = {
        r.source: r.rate_fp for r in admission_rates(plan_frame).collect()
    }
    assert live == batch


def test_feedback_sim_shares_are_a_distribution(spark):
    """On the real fixture: both share columns are valid fixed-point
    distributions (sum within floor-rounding of S), admitted figures
    are internally consistent, and rates stay in the documented
    bounds."""
    from realtime_banking_cdc_pipeline_spark.queries.round15 import (
        _ADMIT_FLOOR_FP,
    )

    rows = {
        r.source: r
        for r in QUERIES["x_plan_feedback_sim"].spark(spark, SF).collect()
    }
    n = len(rows)
    for shares in ("raw_share_fp", "adm_share_fp"):
        tot = sum(getattr(r, shares) for r in rows.values())
        assert _PLAN_S - n <= tot <= _PLAN_S  # floor-division rounding
    for s, r in rows.items():
        assert _ADMIT_FLOOR_FP <= r.rate_fp <= _PLAN_S, s
        if r.n_admitted == 0:
            assert r.adm_tokens == 0, s


def test_feedback_sim_steers_toward_the_mix(spark, tmp_path):
    """Direction pin on a PLANTED skewed corpus (the near-uniform
    sf0.01 fixture only produces ~99% rates, where a single quantized
    draw can flip the sign): big = 90 docs, small = 30, equal lengths.
    Under the T=1/2 mix big is under-target (admits all) and small is
    decayed to ~40% — after one admission step small's raw token
    share must fall and big's must rise, deterministically."""
    docs = spark.createDataFrame(
        [
            (i, "big", f"b{i}a b{i}b b{i}c b{i}d") for i in range(90)
        ]
        + [
            (500 + i, "small", f"s{i}a s{i}b s{i}c s{i}d")
            for i in range(30)
        ],
        "doc_id bigint, source string, text string",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.source: r
        for r in QUERIES["x_plan_feedback_sim"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    big, small = rows["big"], rows["small"]
    assert big.rate_fp == _PLAN_S
    assert small.rate_fp < 500_000  # strongly decayed
    assert small.adm_share_fp < small.raw_share_fp
    assert big.adm_share_fp > big.raw_share_fp
    # one step moves BOTH sources strictly closer to the target mix
    assert abs(big.adm_share_fp - big.mix_ppm) < abs(
        big.raw_share_fp - big.mix_ppm
    )
    assert abs(small.adm_share_fp - small.mix_ppm) < abs(
        small.raw_share_fp - small.mix_ppm
    )
