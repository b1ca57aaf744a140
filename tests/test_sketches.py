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


def test_kmv_estimate_error_bound(spark):
    """KMV distinct estimates on a synthetic corpus with known
    cardinalities: exact when the sketch holds everything, within the
    ~3/sqrt(k) relative-error band when full (k=64 -> 37.5%, generous
    vs the theoretical 1/sqrt(k-2) ~ 12.7% std)."""
    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.queries.round8c import (
        _KMV_K,
        x_kmv_distinct,
    )

    import pandas as pd
    import tempfile, os

    rows = []
    # source "small": 40 distinct (< k, sketch exact); "big": 5000 distinct
    for i in range(40):
        rows.append(("small", f"small text {i}"))
    for i in range(5000):
        rows.append(("big", f"big text {i} with more tokens"))
    # duplicates must not move either estimate
    rows += rows[:500]
    with tempfile.TemporaryDirectory() as td:
        sf = os.path.join(td, "sf")
        os.makedirs(sf)
        pd.DataFrame(rows, columns=["source", "text"]).assign(
            doc_id=range(len(rows)), lang="en", n_chars=10
        ).to_parquet(os.path.join(sf, "documents.parquet"))
        got = {
            r["source"]: r
            for r in x_kmv_distinct(spark, sf).collect()
        }
    assert got["small"]["in_sketch"] == 40
    assert got["small"]["est_distinct"] == 40 == got["small"]["exact_distinct"]
    big = got["big"]
    assert big["in_sketch"] == _KMV_K and big["exact_distinct"] == 5000
    assert abs(big["est_distinct"] - 5000) / 5000 < 3 / (_KMV_K ** 0.5)


def test_ddsketch_error_bound_and_lb_side(spark):
    """Every DDSketch quantile estimate must sit at or below the exact
    order statistic (lower-bound convention) and within the 1/16
    relative-error bound the bin geometry guarantees."""
    from realtime_banking_cdc_pipeline_spark.queries.round8c import (
        x_ddsketch_quantiles,
    )

    rows = x_ddsketch_quantiles(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 30  # 5 priorities x 6 quantiles
    for r in rows:
        assert 0 < r["est_cents"] <= r["exact_cents"]
        assert 0 <= r["err_ppm"] <= 62_500, r


def test_ddsketch_bin_geometry_exhaustive():
    """The integer bin map's claims, checked exhaustively with the same
    arithmetic (numpy mirror of dds_bins' expr): indices are monotone
    in v, the lower bound reconstructs into [lb, v], and the relative
    gap (v - lb)/v never exceeds 1/16."""
    import numpy as np

    v = np.arange(1, 1_000_001, dtype=np.int64)
    bl = np.int64(np.floor(np.log2(v))) + 1  # == bit_length for v >= 1
    small = bl <= 5
    idx = np.where(
        small, v, 16 * bl + ((v - (1 << (bl - 1))) >> np.maximum(bl - 5, 0))
    )
    # monotone nondecreasing
    assert (np.diff(idx) >= 0).all()
    # lower-bound reconstruction (the est_cents back-map)
    e = idx // 16
    lb = np.where(idx <= 31, idx, (1 << (e - 1)) + (idx % 16) * (1 << (e - 5)))
    assert (lb <= v).all()
    assert ((v - lb) / v <= 1 / 16).all()
    # every octave above the unit-bin region carries exactly 16 bins
    # (the last octave is truncated at v's max)
    full_octaves = idx[(bl > 5) & (bl < bl.max())]
    import collections
    per_octave = collections.Counter(full_octaves // 16)
    assert all(
        len({i for i in full_octaves if i // 16 == e}) == 16
        for e in per_octave
    )
