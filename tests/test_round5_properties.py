"""Property-based invariants for the round-5 primitives, against
pure-Python brute force on arbitrary tiny inputs — where pigeonhole
band bugs, orientation double-counts, and decoder offset errors live.

Example counts stay small (each example runs Spark jobs)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.functions.similarity import (
    simhash_hamming_pairs,
)
from realtime_banking_cdc_pipeline_spark.operators.components import triangle_counts

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    fps=st.lists(
        st.integers(min_value=0, max_value=(1 << 32) - 1), min_size=2, max_size=12
    ),
    radius=st.integers(min_value=1, max_value=3),
)
@_SETTINGS
def test_simhash_banding_is_exhaustive(spark, fps, radius):
    """The pigeonhole band join finds EXACTLY the pairs brute-force
    hamming does — for any fingerprints and any radius (radius+1
    bands), including duplicate fingerprints (the contraction path)."""
    rows = [(i, fp) for i, fp in enumerate(fps)]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_hamming_pairs(
            sig, id_col="doc_id", fp_col="simhash", max_hamming=radius
        ).collect()
    }
    want = set()
    for (ia, fa), (ib, fb) in combinations(rows, 2):
        h = bin(fa ^ fb).count("1")
        if h <= radius:
            want.add((min(ia, ib), max(ia, ib), h))
    assert got == want


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
        ),
        min_size=0,
        max_size=16,
    )
)
@_SETTINGS
def test_triangle_counts_match_bruteforce(spark, edges):
    """Per-vertex triangle membership equals the itertools count on any
    small graph (edges normalized to a<b, self-loops dropped)."""
    norm = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    adj = set(norm)
    want: dict[int, int] = {}
    verts = sorted({v for e in norm for v in e})
    for a, b, c in combinations(verts, 3):
        if (a, b) in adj and (b, c) in adj and (a, c) in adj:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    if not norm:
        return  # empty edge frame: nothing to assert beyond no-crash
    pairs = spark.createDataFrame(norm, "id_a long, id_b long")
    got = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(pairs, src="id_a", dst="id_b").collect()
    }
    assert got == want


def test_wav_roundtrip_edge_cases():
    """Decoder handles the odd-size word-alignment path and minimal
    payloads; non-RIFF and compressed formats raise."""
    import numpy as np
    import pytest

    from realtime_banking_cdc_pipeline_spark.functions.multimodal import (
        decode_audio,
        synthesize_wav,
    )

    for mid, n in ((0, 1), (255, 3), (12345, 257)):
        d = decode_audio(synthesize_wav(mid, n))
        i = np.arange(n)
        s = (mid * 31 + i * 7) % 2001 - 1000
        assert d["n_samples"] == n
        assert d["sum_abs"] == int(np.abs(s).sum())
        assert d["sum_sq"] == int((s * s).sum())
        assert d["peak"] == int(np.abs(s).max())
    with pytest.raises(NotImplementedError):
        decode_audio(b"OggS" + b"\x00" * 64)


def test_y4m_roundtrip_edge_cases():
    import numpy as np
    import pytest

    from realtime_banking_cdc_pipeline_spark.functions.multimodal import (
        decode_y4m_frames,
        synthesize_y4m,
    )

    # single frame, sampling step larger than frame count, odd sizes
    for mid, w, h, n, k in ((1, 2, 2, 1, 5), (9, 10, 6, 7, 3), (42, 4, 8, 4, 1)):
        frames = decode_y4m_frames(synthesize_y4m(mid, w, h, n), every_kth=k)
        assert [f["frame_idx"] for f in frames] == list(range(0, n, k))
        ysz = w * h
        for f in frames:
            iy = np.arange(ysz)
            assert f["sum_y"] == int(((mid + 17 * f["frame_idx"] + 3 * iy) % 256).sum())
            assert (f["width"], f["height"]) == (w, h)
    with pytest.raises(NotImplementedError):
        decode_y4m_frames(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32)


def test_degree_orientation_bounds_hub_out_degree(spark):
    """Power-law fixture: a hub touching every leaf, plus leaf-leaf
    edges closing triangles. With id orientation a low-id hub anchors
    O(n^2) wedges; after low-degree→high-degree re-orientation every
    hub edge points INTO the hub, so per-vertex wedge work stays
    bounded — and the triangle counts are unchanged."""
    from realtime_banking_cdc_pipeline_spark.operators.components import (
        degree_oriented_edges,
        triangle_counts,
    )

    n = 60  # hub id 0 (lowest id = worst case for id-orientation)
    edges = [(0, leaf) for leaf in range(1, n + 1)]
    # close a triangle (0, 2i-1, 2i) for each leaf pair
    edges += [(2 * i - 1, 2 * i) for i in range(1, n // 2 + 1)]
    # duplicates + a self-loop: normalization must absorb them
    edges += [(1, 0), (5, 5)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    oriented = degree_oriented_edges(pairs, "id_a", "id_b")
    out_deg = {
        r["id_a"]: r["n"]
        for r in oriented.groupBy("id_a")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # hub (degree n) must anchor NO wedges; leaves anchor <= 2
    assert 0 not in out_deg
    assert max(out_deg.values()) <= 2

    got = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(pairs, src="id_a", dst="id_b").collect()
    }
    want = {0: n // 2}
    for i in range(1, n // 2 + 1):
        want[2 * i - 1] = 1
        want[2 * i] = 1
    assert got == want


@given(
    fps=st.lists(
        st.integers(min_value=0, max_value=(1 << 48) - 1), min_size=2, max_size=10
    ),
    radius=st.integers(min_value=1, max_value=2),
)
@_SETTINGS
def test_simhash_banding_exact_above_double_precision(spark, fps, radius):
    """fp_bits=48: band keys must stay exact past 2^32 (the integer
    shiftright/pmod path — a float-division derivation would corrupt
    keys above 2^53 and silently drop pairs for wide fingerprints)."""
    rows = [(i, fp) for i, fp in enumerate(fps)]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_hamming_pairs(
            sig, id_col="doc_id", fp_col="simhash", max_hamming=radius, fp_bits=48
        ).collect()
    }
    want = set()
    for (ia, fa), (ib, fb) in combinations(rows, 2):
        h = bin(fa ^ fb).count("1")
        if h <= radius:
            want.add((min(ia, ib), max(ia, ib), h))
    assert got == want
