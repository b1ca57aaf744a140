"""Round-8 property tests: capped SemDeDup identity when no cell
exceeds the cap, and recall-eval internal consistency."""

from __future__ import annotations

from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.01"


def test_capped_identical_when_cells_under_cap(spark):
    """When max cell size < _SEM_CAP, every within-cell pair is still
    compared, so x_semdedup_capped must emit EXACTLY x_semdedup's
    verdicts (the approximation only activates on crowded cells).
    At sf0.01 the two-level cells max out at 42 members < 64."""
    from realtime_banking_cdc_pipeline_spark.queries.round8 import _SEM_CAP

    capped = {
        r.vec_id: (r.cell, r.keep)
        for r in QUERIES["x_semdedup_capped"].spark(spark, SF).collect()
    }
    full = {
        r.vec_id: (r.cell, r.keep)
        for r in QUERIES["x_semdedup"].spark(spark, SF).collect()
    }
    sizes: dict[int, int] = {}
    for cell, _ in capped.values():
        sizes[cell] = sizes.get(cell, 0) + 1
    assert max(sizes.values()) < _SEM_CAP, (
        "fixture drifted: a cell reached the cap, identity no longer implied"
    )
    assert capped == full


def test_capped_never_drops_more(spark):
    """Capping removes comparisons, so the capped variant can only
    KEEP MORE: keep=False in capped implies keep=False in full."""
    capped = {
        r.vec_id: r.keep
        for r in QUERIES["x_semdedup_capped"].spark(spark, SF).collect()
    }
    full = {
        r.vec_id: r.keep
        for r in QUERIES["x_semdedup"].spark(spark, SF).collect()
    }
    for vec_id, keep in capped.items():
        if not keep:
            assert not full[vec_id], f"capped dropped {vec_id} but full kept it"


def test_recall_eval_consistency(spark):
    """x_semdedup_recall_eval: captured <= true, ppm ratio exact,
    anchors sampled at the residue-class budget."""
    row = QUERIES["x_semdedup_recall_eval"].spark(spark, SF).collect()[0]
    assert 0 < row.n_anchors <= row.n_vectors
    assert 0 <= row.captured_pairs <= row.true_pairs
    expect_ppm = (
        0
        if row.true_pairs == 0
        else row.captured_pairs * 1_000_000 // row.true_pairs
    )
    assert row.recall_ppm == expect_ppm
    assert row.max_cell >= 1
    assert row.cell_sum_sq >= row.n_vectors  # sum sz^2 >= sum sz = N


def test_capped_pair_budget_is_linear(spark):
    """The capped variant's candidate-pair count must respect the
    <= _SEM_CAP * N bound that makes its pair stage linear (the
    uncapped within-cell count at this sf already exceeds it)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.queries.llmdata import _emb
    from realtime_banking_cdc_pipeline_spark.queries.round6b import (
        _two_level_cells,
    )
    from realtime_banking_cdc_pipeline_spark.queries.round8 import _SEM_CAP

    sf01 = "/root/testdata/sf0.1"
    emb, cells = _two_level_cells(spark, _emb(spark, sf01))
    n = emb.count()
    m = cells.select("vec_id", "cid", "ccos")
    w = Window.partitionBy("cid").orderBy(
        F.col("ccos").desc(), F.col("vec_id").asc()
    )
    capset = (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SEM_CAP)
        .select(F.col("cid").alias("ca"), F.col("vec_id").alias("i"))
    )
    b = m.select(F.col("cid").alias("cb"), F.col("vec_id").alias("j"))
    capped_pairs = capset.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("i") < F.col("j"))
    ).count()
    uncapped_pairs = (
        m.groupBy("cid").count().agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2)
        ).collect()[0][0]
    )
    assert capped_pairs <= _SEM_CAP * n
    assert capped_pairs < uncapped_pairs, (
        "fixture drifted: no cell exceeds the cap at sf0.1, bound untested"
    )


def test_gif_codec_round_trip_and_edge_cases():
    """The from-scratch GIF LZW codec: synthesized payloads decode to
    the analytic formula; adversarial small-alphabet streams (deep
    dictionaries, KwKwK codes, 4096 resets) round-trip exactly;
    extension blocks are skipped; truncation is loud."""
    import random

    from realtime_banking_cdc_pipeline_spark.functions.multimodal import (
        _gif_lzw_compress,
        _gif_lzw_decompress,
        decode_image,
        synthesize_gif,
    )

    for mid, w, h in [(0, 8, 5), (255, 31, 7), (3, 200, 200)]:
        got = decode_image(synthesize_gif(mid, w, h))
        n = w * h
        exp = {
            "width": w, "height": h, "channels": 3,
            "sum_r": sum((7 * ((mid + k) % 256)) % 256 for k in range(n)),
            "sum_g": sum((11 * ((mid + k) % 256)) % 256 for k in range(n)),
            "sum_b": sum((13 * ((mid + k) % 256)) % 256 for k in range(n)),
        }
        assert got == exp

    rnd = random.Random(7)
    for _ in range(3):
        # tiny alphabet -> deep dictionary strings + KwKwK; long random
        # 256-alphabet stream -> ~1 add/symbol, forcing the 4096 reset
        s = bytes(rnd.choice([0, 1, 2]) for _ in range(20000))
        assert _gif_lzw_decompress(_gif_lzw_compress(s, 8), 8) == s
        s2 = bytes(rnd.randrange(256) for _ in range(10000))
        assert _gif_lzw_decompress(_gif_lzw_compress(s2, 8), 8) == s2

    # a GIF89a graphic-control extension before the descriptor is skipped
    payload = synthesize_gif(9, 10, 6)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = payload[:13 + 768] + ext + payload[13 + 768:]
    assert decode_image(patched) == decode_image(payload)

    # truncated LZW stream raises instead of returning wrong sums
    import pytest

    with pytest.raises(ValueError):
        _gif_lzw_decompress(_gif_lzw_compress(bytes(range(100)), 8)[:-3], 8)


def test_mulaw_table_matches_stdlib_and_wav_roundtrip():
    """The from-scratch G.711 mu-law expansion must bit-match an
    independent implementation (stdlib ``audioop.ulaw2lin``) on every
    possible byte, and the mu-law WAV path through decode_audio must
    report exact integer stats for the synthesized stream."""
    import numpy as np
    import pytest

    from realtime_banking_cdc_pipeline_spark.functions.multimodal import (
        _mulaw_decode_table,
        decode_audio,
        synthesize_wav_mulaw,
    )

    t = _mulaw_decode_table()
    try:
        import audioop  # removed in Python 3.13 — gate, don't fail
    except ImportError:
        pass
    else:
        ref = np.frombuffer(
            audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2"
        ).astype(np.int64)
        assert (t == ref).all()

    # canonical endpoints of the G.711 map
    assert t[0xFF] == 0 and t[0x7F] == 0
    assert t[0x00] == -32124 and t[0x80] == 32124

    for mid, n in ((0, 1), (255, 3), (12345, 257)):
        d = decode_audio(synthesize_wav_mulaw(mid, n))
        s = t[(mid * 13 + np.arange(n) * 7) % 256]
        assert d["n_samples"] == n
        assert d["sum_abs"] == int(np.abs(s).sum())
        assert d["sum_sq"] == int((s * s).sum())
        assert d["peak"] == int(np.abs(s).max())

    # unsupported format codes still raise
    bad = bytearray(synthesize_wav_mulaw(1, 4))
    bad[20] = 2  # ADPCM
    with pytest.raises(NotImplementedError):
        decode_audio(bytes(bad))


def test_resize_box_filter_exact_and_format_agnostic():
    """resize_image_box must equal the hand-computed per-block integer
    mean on the PPM path, produce IDENTICAL stats through the PNG and
    GIF decode paths when the raw pixels agree, and reject odd dims."""
    import numpy as np
    import pytest

    from realtime_banking_cdc_pipeline_spark.functions.multimodal import (
        decode_image,
        decode_image_rgb,
        resize_image_box,
        synthesize_png,
        synthesize_ppm,
    )

    for mid, w, h in ((0, 2, 2), (7, 10, 8), (123, 16, 14)):
        got = resize_image_box(synthesize_ppm(mid, w, h))
        idx = np.arange(w * h * 3, dtype=np.int64)
        rgb = ((mid + idx) % 256).reshape(h, w, 3)
        exp = (
            rgb.reshape(h // 2, 2, w // 2, 2, 3).sum(axis=(1, 3)) // 4
        )
        assert got == {
            "width": w, "height": h,
            "out_width": w // 2, "out_height": h // 2,
            "sum_r": int(exp[:, :, 0].sum()),
            "sum_g": int(exp[:, :, 1].sum()),
            "sum_b": int(exp[:, :, 2].sum()),
        }
        # PNG carries the same generative pixels -> identical resize
        assert resize_image_box(synthesize_png(mid, w, h)) == got

    with pytest.raises(ValueError):
        resize_image_box(synthesize_ppm(1, 3, 4))

    # the decode_image wrapper still reports the full-res sums
    d = decode_image(synthesize_ppm(5, 4, 4))
    _, _, rgb = decode_image_rgb(synthesize_ppm(5, 4, 4))
    assert d["sum_r"] == int(rgb[:, :, 0].sum())


def test_bfs_distances_path_graph(spark):
    """Hand-built graph: a 6-path with two seeds and a disconnected
    edge — distances must be min-over-seeds, symmetric, and truncated
    at the radius (nodes further than iters hops absent)."""
    from realtime_banking_cdc_pipeline_spark.operators.components import (
        bfs_distances,
    )

    # path 1-2-3-4-5-6, island 10-11; seeds 1 and 6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,), (6,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(edges, seeds, iters=2).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 2, 5: 1, 6: 0}

    # radius 1: the middle of the path is unreached
    got1 = {
        r["id"]: r["dist"]
        for r in bfs_distances(edges, seeds, iters=1).collect()
    }
    assert got1 == {1: 0, 2: 1, 5: 1, 6: 0}

    # island seed reaches only the island
    giso = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            edges, spark.createDataFrame([(10,)], "id long"), iters=3
        ).collect()
    }
    assert giso == {10: 0, 11: 1}
