"""Bounded-error check for the approximate sketches (r2 verdict #8).

``a_approx_sketches`` is rows-only in the driver artifact by design —
HLL/KLL internals differ per engine, so no cross-engine hash exists.
This pins the thing that CAN be asserted: every approximate answer
lies within its advertised error bound of the exact twin
(``a_distinct_users`` / ``a_percentiles``), turning "rows-only" into a
tolerance gate.
"""

from __future__ import annotations

from realtime_banking_cdc_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"

# approx_count_distinct(rsd=0.02): 3σ ≈ 6% relative error.
_HLL_TOL = 3 * 0.02
# percentile_approx(accuracy=10000) guarantees rank error ≤ 1/10000;
# assert against the far looser ±1% rank window so the test pins the
# contract without flaking on sketch internals.
_RANK_TOL = 0.01


def test_approx_sketches_within_bounds_of_exact_twins(spark):
    import pyspark.sql.functions as F

    from realtime_banking_cdc_pipeline_spark.queries._det import events_table

    approx = {
        r["event_type"]: r
        for r in QUERIES["a_approx_sketches"].spark(spark, SF).collect()
    }
    exact_users = {
        r["event_type"]: r["n_users"]
        for r in QUERIES["a_distinct_users"].spark(spark, SF).collect()
    }
    assert set(approx) == set(exact_users)

    for et, row in approx.items():
        exact = exact_users[et]
        assert abs(row["approx_users"] - exact) <= _HLL_TOL * exact, (
            et, row["approx_users"], exact
        )

    # exact percentiles at q ± rank_tol bracket the approx answer
    qs = [0.5, 0.9, 0.99]
    brackets = [(max(0.0, q - _RANK_TOL), min(1.0, q + _RANK_TOL)) for q in qs]
    flat = [b for pair in brackets for b in pair]
    ev = events_table(spark, SF)
    bounds = {
        r["event_type"]: r["b"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile("value", F.lit(flat)).alias("b"))
        .collect()
    }
    for et, row in approx.items():
        for i, name in enumerate(["approx_p50", "approx_p90", "approx_p99"]):
            lo, hi = bounds[et][2 * i], bounds[et][2 * i + 1]
            assert lo <= row[name] <= hi, (et, name, row[name], lo, hi)
