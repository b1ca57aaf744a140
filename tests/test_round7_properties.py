"""Round-7 property tests: ExactSubstr k-gram anchoring vs a direct
python model, and Gopher rule exactness."""

from __future__ import annotations

from collections import defaultdict

from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES
from realtime_banking_cdc_pipeline_spark.queries.round7 import (
    _GOPHER_REQ_STOPS,
    _XSUB_K,
)

SF = "/root/testdata/sf0.001"


def _toks(text):
    return [t for t in text.strip().lower().split(" ") if t]


def _doc_tokens(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    return {r.doc_id: _toks(r.text) for r in rows}


def _spans_from_anchors(anchors_by_doc):
    """Union of [p, p+k) intervals -> maximal spans, the python model."""
    out = defaultdict(list)
    for doc, ps in anchors_by_doc.items():
        ps = sorted(ps)
        start = prev = None
        for p in ps:
            if prev is None or p - prev > _XSUB_K:
                if prev is not None:
                    out[doc].append((start, prev + _XSUB_K))
                start = p
            prev = p
        if prev is not None:
            out[doc].append((start, prev + _XSUB_K))
    return out


def test_substring_dedup_matches_python_model(spark):
    docs = _doc_tokens(spark)
    occ = defaultdict(list)
    for doc, toks in docs.items():
        for p in range(len(toks) - _XSUB_K + 1):
            occ[tuple(toks[p : p + _XSUB_K])].append((doc, p))
    anchors = defaultdict(set)
    for gram, locs in occ.items():
        if len(locs) >= 2:
            for doc, p in locs:
                anchors[doc].add(p)
    expect = {
        (doc, s, e) for doc, spans in _spans_from_anchors(anchors).items()
        for s, e in spans
    }
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in QUERIES["x_substring_dedup"].spark(spark, SF).collect()
    }
    assert got == expect
    # every span is at least one full k-gram and bounds are sane
    for _, s, e in got:
        assert e - s >= _XSUB_K


def test_substring_keep_first_spares_the_first_occurrence(spark):
    docs = _doc_tokens(spark)
    occ = defaultdict(list)
    for doc, toks in docs.items():
        for p in range(len(toks) - _XSUB_K + 1):
            occ[tuple(toks[p : p + _XSUB_K])].append((doc, p))
    anchors = defaultdict(set)
    for gram, locs in occ.items():
        if len(locs) >= 2:
            for doc, p in sorted(locs)[1:]:  # keep-one: first survives
                anchors[doc].add(p)
    expect = {
        (doc, s, e) for doc, spans in _spans_from_anchors(anchors).items()
        for s, e in spans
    }
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in QUERIES["x_substring_keep_first"].spark(spark, SF).collect()
    }
    assert got == expect

    # keep-first anchors are a subset of remove-all anchors, so its
    # total covered token mass can never exceed remove-all's
    cover = lambda rows: sum(e - s for _, s, e in rows)  # noqa: E731
    all_spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in QUERIES["x_substring_dedup"].spark(spark, SF).collect()
    }
    assert cover(got) <= cover(all_spans)


def test_gopher_rules_match_python_model(spark):
    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()
    got = {
        r.doc_id: r.asDict()
        for r in QUERIES["x_gopher_rules"].spark(spark, SF).collect()
    }
    assert set(got) == {r.doc_id for r in rows}
    for r in rows:
        toks = _toks(r.text)
        lines = r.text.split("\n")
        g = got[r.doc_id]
        assert g["n_words"] == len(toks)
        assert g["n_lines"] == len(lines)
        assert g["sum_word_chars"] == sum(len(t) for t in toks)
        n_alpha = sum(1 for t in toks if any(c.isalpha() for c in t.lower()))
        assert g["n_alpha_words"] == n_alpha
        n_req = sum(1 for s in _GOPHER_REQ_STOPS if s in toks)
        assert g["n_req_stops"] == n_req
        assert g["r_wordcount"] == (50 <= len(toks) <= 100000)
        assert g["r_alpha"] == (5 * n_alpha >= 4 * len(toks))
        assert g["r_stopwords"] == (n_req >= 2)
        assert g["keep"] == all(
            g[k]
            for k in (
                "r_wordcount", "r_meanlen", "r_symbol", "r_bullet",
                "r_ellipsis", "r_alpha", "r_stopwords",
            )
        )


def test_winnowing_matches_python_model_and_guarantee(spark):
    """Winnowing: rightmost-min selection per window, python-replayed;
    plus the paper's guarantee — every w-window of k-gram hashes
    contains at least one selected fingerprint position."""
    import hashlib

    from realtime_banking_cdc_pipeline_spark.queries.round7 import (
        _WIN_HMAX,
        _WIN_W,
    )

    docs = _doc_tokens(spark)

    def h(gram):
        return int(hashlib.md5(" ".join(gram).encode()).hexdigest()[:7], 16)

    expect = set()
    windows_total = 0
    sel_by_doc = {}
    for doc, toks in docs.items():
        hs = [
            h(tuple(toks[p : p + _XSUB_K]))
            for p in range(len(toks) - _XSUB_K + 1)
        ]
        picked = set()
        for end in range(_WIN_W - 1, len(hs)):
            lo = end - _WIN_W + 1
            best = max(
                range(lo, end + 1), key=lambda q: ((_WIN_HMAX - hs[q]), q)
            )
            picked.add((best, hs[best]))
            windows_total += 1
        for q, fp in picked:
            expect.add((doc, q, fp))
        sel_by_doc[doc] = {q for q, _ in picked}

    got = {
        (r.doc_id, r.pos, r.fp)
        for r in QUERIES["x_winnowing"].spark(spark, SF).collect()
    }
    assert got == expect

    # guarantee: each w-window has a selected position inside it
    for doc, toks in docs.items():
        n = len(toks) - _XSUB_K + 1
        for end in range(_WIN_W - 1, n):
            lo = end - _WIN_W + 1
            assert any(lo <= q <= end for q in sel_by_doc[doc]), (doc, end)


def test_contract_first_components_equal_direct_components(spark):
    """neardup_components (exact-dup contraction first) must equal the
    direct components-over-all-docs construction on corpora with mixed
    exact-dup / near-dup / unique structure — the invariant the
    contract-first default rests on."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from realtime_banking_cdc_pipeline_spark.operators.components import (
        connected_components,
    )
    from realtime_banking_cdc_pipeline_spark.queries.llmdata import (
        neardup_candidate_pairs,
        neardup_components,
    )

    base_words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 3),  # which base text family
                st.integers(0, 2),  # 0: exact copy, 1/2: token edit
            ),
            min_size=2,
            max_size=14,
        )
    )
    def check(spec):
        rows = []
        for i, (fam, edit) in enumerate(spec):
            words = [f"{w}{fam}" for w in base_words * 3]
            if edit:
                words[edit * 3] = words[edit * 3] + "x"
            rows.append((i, " ".join(words)))
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        direct = {
            (r.id, r.component)
            for r in connected_components(
                neardup_candidate_pairs(d),
                src="id_a", dst="id_b", nodes=d.select("doc_id"),
            ).collect()
        }
        contracted = {
            (r.id, r.component) for r in neardup_components(d).collect()
        }
        assert contracted == direct

    check()


def test_sketches_honor_their_guarantees(spark):
    """Deterministic sketches: bloom never false-negatives, CMS never
    underestimates, HLL registers match a python replay."""
    import hashlib
    import math

    from realtime_banking_cdc_pipeline_spark.queries.round7b import (
        _BLOOM_K,
        _BLOOM_MOD,
        _HLL_M,
        _HLL_NUM,
        _HLL_SCALE,
        _HLL_W,
    )

    rows = spark.read.parquet(f"{SF}/documents.parquet").collect()

    # Bloom: one-sided
    got = QUERIES["x_bloom_decontaminate"].spark(spark, SF).collect()
    assert len(got) == sum(1 for r in rows if r.doc_id % _BLOOM_MOD != 0)
    assert all(r.bloom_hit or not r.exact_dup for r in got), "false negative"
    bench_texts = {r.text for r in rows if r.doc_id % _BLOOM_MOD == 0}
    exact = {r.doc_id: r.text in bench_texts for r in rows
             if r.doc_id % _BLOOM_MOD != 0}
    assert {r.doc_id: r.exact_dup for r in got} == exact

    # CMS: est >= exact on every reported term
    cms = QUERIES["x_cms_heavy_hitters"].spark(spark, SF).collect()
    assert cms and all(r.overestimate >= 0 for r in cms)
    assert all(r.cms_estimate == r.exact_cnt + r.overestimate for r in cms)

    # HLL: python register replay, exact estimate equality
    regs, seen = {}, {}
    for r in rows:
        hv = int(hashlib.md5(r.text.encode()).hexdigest()[:15], 16)
        bucket, w = hv % _HLL_M, hv // _HLL_M
        rank = (_HLL_W + 1) if w == 0 else _HLL_W - w.bit_length() + 1
        key = (r.source, bucket)
        regs[key] = max(regs.get(key, 0), rank)
        seen.setdefault(r.source, set()).add(r.text)
    expect = {}
    for src in seen:
        ms = [v for (s, _), v in regs.items() if s == src]
        sum_fp = sum(1 << (_HLL_SCALE - m) for m in ms)
        zeros = _HLL_M - len(ms)
        est = math.floor(
            _HLL_NUM / (float(sum_fp) + zeros * float(1 << _HLL_SCALE))
        )
        expect[src] = (len(seen[src]), est, zeros)
    got_hll = {
        r.source: (r.n_exact, r.hll_estimate, r.zero_registers)
        for r in QUERIES["x_hll_distinct"].spark(spark, SF).collect()
    }
    assert got_hll == expect


def test_hll_register_merge_is_the_batch_sketch(spark):
    """Incremental HLL: per-batch register tables max-merged (in any
    order, with a replayed batch thrown in) must equal the one-shot
    batch registers — the mergeability that makes the sketch a
    streaming distinct-count."""
    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.functions.sketches import (
        hll_registers,
        merge_hll_registers,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select("source", "text")
    whole = {
        (r.key, r.bucket): r.m_j
        for r in hll_registers(d, "source", "text").collect()
    }
    b0 = hll_registers(d.filter(F.col("doc_id").isNull() | True).limit(0), "source", "text")
    parts = [
        hll_registers(d.filter(F.col("text") < "m"), "source", "text"),
        hll_registers(d.filter(F.col("text") >= "m"), "source", "text"),
    ]
    # replay one part twice: idempotence must hold
    merged = merge_hll_registers(b0, parts[0], parts[1], parts[0])
    got = {(r.key, r.bucket): r.m_j for r in merged.collect()}
    assert got == whole


def test_incremental_substr_anchors_match_batch(spark, tmp_path):
    """Incremental ExactSubstr: per-epoch emissions union to EXACTLY
    the batch-mode anchor set, regardless of batch split, arrival
    order, or a replayed epoch — each anchor exactly once."""
    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.streaming.substr import (
        batch_shingles,
        ingest_substr_batch,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    ng = batch_shingles(docs)
    rep = (
        ng.groupBy("g1", "g2")
        .count()
        .filter(F.col("count") >= 2)
        .select("g1", "g2")
    )
    batch_anchors = {
        (r.doc_id, r.p)
        for r in ng.join(rep, ["g1", "g2"]).select("doc_id", "p").collect()
    }
    assert batch_anchors, "fixture must have repeated grams"

    thirds = [
        docs.filter(F.col("doc_id") % 3 == i) for i in (2, 0, 1)  # shuffled order
    ]
    store = str(tmp_path / "substr_store")
    got = set()
    emissions = []
    for e, b in enumerate(thirds):
        out = {
            (r.doc_id, r.p) for r in ingest_substr_batch(b, store, e).collect()
        }
        assert not (out & got), "an anchor emitted twice across epochs"
        emissions.append(out)
        got |= out
    assert got == batch_anchors

    # replaying the final epoch reproduces its emission and leaves the
    # store with exactly one copy of its partitions
    replay = {
        (r.doc_id, r.p)
        for r in ingest_substr_batch(thirds[-1], store, len(thirds) - 1).collect()
    }
    assert replay == emissions[-1]


def test_streaming_hll_monitor_converges_to_batch_registers(spark, tmp_path):
    """Real readStream/foreachBatch wiring: after draining a file queue
    one file per micro-batch, the folded register store equals the
    one-shot batch registers over the whole corpus. Each batch writes
    ONLY its own epoch partition (crash-safe: history is never
    cleared), the fold happens on read, and compaction collapses the
    partitions without changing the fold."""
    import json as _json
    import os as _os

    from pyspark.sql.types import StringType, StructField, StructType

    from realtime_banking_cdc_pipeline_spark.functions.sketches import (
        hll_registers,
    )
    from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
        compact_hll_store,
        read_hll_store,
        start_distinct_monitor,
        update_hll_store,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "text"
    )
    whole = {
        (r.key, r.bucket): r.m_j
        for r in hll_registers(docs, "source", "text").collect()
    }

    src = tmp_path / "src"
    src.mkdir()
    rows = docs.collect()
    for i in range(3):
        with open(src / f"part-{i}.json", "w") as f:
            for r in rows[i::3]:
                f.write(_json.dumps({"source": r.source, "text": r.text}) + "\n")
    schema = StructType(
        [StructField("source", StringType()), StructField("text", StringType())]
    )
    store = str(tmp_path / "hll_store")
    q = start_distinct_monitor(
        spark, str(src), store, str(tmp_path / "ckpt"), schema,
        key_col="source", value_col="text",
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.bucket): r.m_j
        for r in read_hll_store(spark, store).collect()
    }
    assert got == whole
    # crash-safety shape: per-epoch partitions on disk, never a flat
    # whole-store overwrite
    parts = sorted(
        n for n in _os.listdir(store) if n.startswith("epoch=")
    )
    assert len(parts) >= 3

    # replaying an arbitrary batch (fresh epoch, subset data) leaves
    # the FOLD unchanged — at-least-once is exactly-once for max-merge
    update_hll_store(
        docs.limit(50), store, key_col="source", value_col="text",
        epoch_id=99,
    )
    again = {
        (r.key, r.bucket): r.m_j
        for r in read_hll_store(spark, store).collect()
    }
    assert again == whole

    # compaction collapses to one base partition with the same fold,
    # and a REPLAYED compaction epoch is a no-op too
    compact_hll_store(spark, store, epoch_id=100)
    assert _os.listdir(store) == ["epoch=-100"] or sorted(
        n for n in _os.listdir(store) if n.startswith("epoch=")
    ) == ["epoch=-100"]
    compact_hll_store(spark, store, epoch_id=100)
    compacted = {
        (r.key, r.bucket): r.m_j
        for r in read_hll_store(spark, store).collect()
    }
    assert compacted == whole
