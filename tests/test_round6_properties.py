"""Round-6 op invariants against brute force (engine-independent — the
DuckDB oracle checks Spark-vs-SQL; these check both against numpy)."""

from __future__ import annotations

import math

import numpy as np

from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES
from realtime_banking_cdc_pipeline_spark.queries.llmdata import adaptive_cells
from realtime_banking_cdc_pipeline_spark.queries.round6b import (
    _SEMDEDUP_THRESHOLD,
    coarse_cells,
)

SF = "/root/testdata/sf0.001"


def _fx(v):
    return np.floor(np.asarray(v, dtype=np.float64) * (1 << 20)).astype(np.int64)


def _cos(a_fx, b_fx):
    dot = float((a_fx * b_fx).sum())
    na = float((a_fx * a_fx).sum())
    nb = float((b_fx * b_fx).sum())
    return dot / math.sqrt(na * nb)


def test_semdedup_matches_numpy_bruteforce(spark):
    emb = {
        r.vec_id: _fx(r.embedding)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    # two-level cell assignment: top-nprobe coarse centroids
    # (kc ~ sqrt(k)) then nearest fine centroid within the probed
    # coarse groups; every ranking maximizes (cos, -id) — the
    # _two_level_cells rule
    from realtime_banking_cdc_pipeline_spark.queries.round6b import (
        _SEM_NPROBE,
    )

    k = adaptive_cells(len(emb))
    kc = coarse_cells(k)
    cents = {i: emb[i] for i in range(k) if i in emb}
    ccents = {i: emb[i] for i in range(kc) if i in emb}
    fmap = {
        c: max(ccents, key=lambda cc: (_cos(cv, ccents[cc]), -cc))
        for c, cv in cents.items()
    }
    cell = {}
    for v, e in emb.items():
        top = sorted(
            ccents, key=lambda c: (-_cos(e, ccents[c]), c)
        )[:_SEM_NPROBE]
        group = [c for c in cents if fmap[c] in top]
        cell[v] = max(group, key=lambda c: (_cos(e, cents[c]), -c))
    dropped = {
        j
        for j in emb
        for i in emb
        if i < j and cell[i] == cell[j] and _cos(emb[i], emb[j]) >= _SEMDEDUP_THRESHOLD
    }

    got = {
        r.vec_id: (r.cell, r.keep)
        for r in QUERIES["x_semdedup"].spark(spark, SF).collect()
    }
    assert set(got) == set(emb)
    for v, (c, keep) in got.items():
        assert c == cell[v], f"cell mismatch for {v}"
        assert keep == (v not in dropped), f"keep mismatch for {v}"


def test_k_core_matches_python_peeling(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from realtime_banking_cdc_pipeline_spark.operators.components import k_core

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(st.integers(0, 14), st.integers(0, 14)),
            min_size=1,
            max_size=40,
        )
    )
    def run(edges):
        # python brute force: peel until fixpoint
        adj = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        while True:
            deg: dict[int, int] = {}
            for a, b in adj:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            weak = {v for v, c in deg.items() if c < 2}
            if not weak:
                break
            adj = {(a, b) for a, b in adj if a not in weak and b not in weak}
        expect = deg if adj else {}

        df = spark.createDataFrame(
            [(a, b) for a, b in edges], "src BIGINT, dst BIGINT"
        )
        got = {
            r.id: r.core_degree
            for r in k_core(df.filter("src != dst"), 2).collect()
        } if adj or edges else {}
        if not adj:
            # Spark side returns empty when everything peels
            assert all(
                v == 0 for v in got.values()
            ) or got == {}, got
        else:
            assert got == expect

    run()


def test_bpe_merges_match_python_reference(spark):
    """x_bpe_merges' replace-based merge application must equal the
    canonical BPE algorithm (count pairs weighted by token freq, merge
    ALL occurrences left-to-right, repeat) run in plain python over the
    same corpus."""
    import collections

    from pyspark.sql import functions as F

    from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES
    from realtime_banking_cdc_pipeline_spark.queries.round6b import _BPE_MERGES

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    freq = collections.Counter(
        w for r in docs for w in r.text.strip().lower().split() if w
    )
    seqs = {tok: tuple(tok) for tok in freq}
    expect = []
    for rank in range(1, _BPE_MERGES + 1):
        counts = collections.Counter()
        for tok, sy in seqs.items():
            for j in range(len(sy) - 1):
                counts[(sy[j], sy[j + 1])] += freq[tok]
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        expect.append((rank, f"{a} {b}", cnt))
        merged = a + b
        new = {}
        for tok, sy in seqs.items():
            out, j = [], 0
            while j < len(sy):
                if j + 1 < len(sy) and sy[j] == a and sy[j + 1] == b:
                    out.append(merged)
                    j += 2
                else:
                    out.append(sy[j])
                    j += 1
            new[tok] = tuple(out)
        seqs = new

    got = [
        (r.merge_rank, r.merged_pair, r.pair_count)
        for r in QUERIES["x_bpe_merges"].spark(spark, SF).collect()
    ]
    assert got == expect


def test_temperature_mix_quotas_exact(spark):
    """Largest-remainder allocation: per-language quotas must sum to
    exactly the budget, each quota <= group size at this fixture, and
    the sampled rows must be each language's md5-rank prefix."""
    import hashlib

    from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES
    from realtime_banking_cdc_pipeline_spark.queries.round6b import _TMIX_K

    docs = [
        (r.doc_id, r.lang)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    ]
    from collections import Counter

    cnt = Counter(lang for _, lang in docs)
    s = sum(c * c for c in cnt.values())
    base = {l: (_TMIX_K * c * c) // s for l, c in cnt.items()}
    rem = {l: (_TMIX_K * c * c) % s for l, c in cnt.items()}
    deficit = _TMIX_K - sum(base.values())
    for l in sorted(rem, key=lambda l: (-rem[l], l))[:deficit]:
        base[l] += 1
    assert sum(base.values()) == _TMIX_K

    got = QUERIES["x_temperature_mix"].spark(spark, SF).collect()
    per_lang = Counter(r.lang for r in got)
    assert dict(per_lang) == {l: q for l, q in base.items() if q > 0}
    # md5-rank prefix per language
    for lang in per_lang:
        ranked = sorted(
            (d for d, l in docs if l == lang),
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )
        expect_ids = set(ranked[: base[lang]])
        assert {r.doc_id for r in got if r.lang == lang} == expect_ids


def test_chunks_reconstruct_documents(spark):
    """Window/stride chunking invariants: chunk 0 starts at 0, strides
    are constant, the last chunk reaches the final token, and chunk
    fingerprints match md5 of the token slice."""
    import hashlib

    from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES
    from realtime_banking_cdc_pipeline_spark.queries.round6b import (
        _CHUNK_S,
        _CHUNK_W,
    )

    toks = {
        r.doc_id: r.text.strip().lower().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    rows = QUERIES["x_chunk_documents"].spark(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(toks)
    for doc_id, chunks in by_doc.items():
        t = toks[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.start_tok == c.chunk_idx * _CHUNK_S
            piece = t[c.start_tok : c.start_tok + _CHUNK_W]
            assert c.n_tok == len(piece)
            assert c.chunk_fp == hashlib.md5(" ".join(piece).encode()).hexdigest()
        last = chunks[-1]
        assert last.start_tok + last.n_tok == len(t), "last chunk must reach the end"
        if len(chunks) > 1:
            assert chunks[-2].start_tok + _CHUNK_W < len(t) + _CHUNK_S


# ---------------------------------------------------------------------------
# Round-6c: decontamination / curriculum / batching vs brute force
# ---------------------------------------------------------------------------


def test_cross_corpus_dedup_matches_python_minhash(spark):
    """Recompute the decontamination verdicts in pure python (md5
    minhash + banding, byte-identical spec) and compare every flag."""
    import hashlib

    from realtime_banking_cdc_pipeline_spark.functions.similarity import (
        MINHASH_PERMS,
        MINHASH_PRIME,
        minhash_coeffs,
    )
    from realtime_banking_cdc_pipeline_spark.queries.round6c import (
        _XCCD_MIN_MATCH,
        _XCCD_MOD,
    )

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    def shingles(text, k=3):
        toks = [t for t in text.strip().split() if t]
        if len(toks) <= k - 1:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    def sig(text):
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:7], 16)
            for s in shingles(text)
        ]
        return [
            min((a * h + b) % MINHASH_PRIME for h in hs)
            for a, b in minhash_coeffs(MINHASH_PERMS)
        ]

    sigs = {i: sig(t) for i, t in docs.items()}
    r = MINHASH_PERMS // 4
    # band index stays IN the key: SQL/Spark band-join only on the SAME
    # band position, so a cross-position key collision must not count
    bands = {
        i: {(b, tuple(s[b * r : (b + 1) * r])) for b in range(4)}
        for i, s in sigs.items()
    }
    bench = [i for i in docs if i % _XCCD_MOD == 0]
    train = [i for i in docs if i % _XCCD_MOD != 0]
    bench_texts = {docs[i] for i in bench}

    expect = {}
    for i in train:
        exact = docs[i] in bench_texts
        near = any(
            bands[i] & bands[j]
            and sum(x == y for x, y in zip(sigs[i], sigs[j])) >= _XCCD_MIN_MATCH
            for j in bench
        )
        expect[i] = (int(exact), int(near), int(not exact and not near))

    got = {
        row.doc_id: (row.exact_dup, row.near_dup, row.keep)
        for row in QUERIES["x_cross_corpus_dedup"].spark(spark, SF).collect()
    }
    assert got == expect
    # identical text => identical signature => near flag always covers exact
    assert all(n >= e for e, n, _ in got.values())


def test_curriculum_order_is_the_global_sort_rank(spark):
    """The cell-cumsum construction must equal ROW_NUMBER() OVER
    (ORDER BY difficulty, doc_id) computed naively."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    diff = {r.doc_id: len([t for t in r.text.strip().split() if t]) for r in docs}
    order = sorted(diff, key=lambda i: (diff[i], i))
    pos = {i: p + 1 for p, i in enumerate(order)}
    n = len(order)

    got = QUERIES["x_curriculum_order"].spark(spark, SF).collect()
    assert len(got) == n
    for row in got:
        assert row.difficulty == diff[row.doc_id]
        assert row.pos == pos[row.doc_id]
        assert row.phase == ((row.pos - 1) * 4) // n


def test_length_bucket_batching_waste_accounting(spark):
    """Batches must partition each (band, shard) in length order with
    exact padding-waste; total waste equals the python recomputation."""
    import hashlib

    from realtime_banking_cdc_pipeline_spark.queries.round6c import (
        _XLBB_BAND,
        _XLBB_BATCH,
        _XLBB_MAX_BUCKET,
        _XLBB_SHARDS,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    rows = []
    for r in docs:
        ntok = len([t for t in r.text.strip().split() if t])
        shard = (
            int(hashlib.md5(f"batch-v1:{r.doc_id}".encode()).hexdigest()[:7], 16)
            % _XLBB_SHARDS
        )
        rows.append((min(ntok // _XLBB_BAND, _XLBB_MAX_BUCKET), shard, ntok, r.doc_id))

    expect = {}
    from collections import defaultdict

    groups = defaultdict(list)
    for b, s, n, i in rows:
        groups[(b, s)].append((n, i))
    for (b, s), members in groups.items():
        members.sort()
        for bi in range(0, len(members), _XLBB_BATCH):
            batch = members[bi : bi + _XLBB_BATCH]
            lens = [n for n, _ in batch]
            expect[(b, s, bi // _XLBB_BATCH)] = (
                len(batch),
                min(lens),
                max(lens),
                len(batch) * max(lens) - sum(lens),
            )

    got = {
        (r.bucket, r.shard, r.batch_idx): (r.n_docs, r.min_len, r.max_len, r.pad_waste)
        for r in QUERIES["x_length_bucket_batching"].spark(spark, SF).collect()
    }
    assert got == expect


def test_bpe_apply_fertility_matches_python_tokenizer(spark):
    """x_bpe_apply's per-doc subword counts must equal tokenizing every
    document with the canonical python BPE (same induction as the
    merge test, then greedy left-to-right application per word)."""
    import collections

    from realtime_banking_cdc_pipeline_spark.queries.round6b import _BPE_MERGES

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    freq = collections.Counter(
        w for r in docs for w in r.text.strip().lower().split() if w
    )
    seqs = {tok: tuple(tok) for tok in freq}
    for _ in range(_BPE_MERGES):
        counts = collections.Counter()
        for tok, sy in seqs.items():
            for j in range(len(sy) - 1):
                counts[(sy[j], sy[j + 1])] += freq[tok]
        (a, b), _cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        new = {}
        for tok, sy in seqs.items():
            out, j = [], 0
            while j < len(sy):
                if j + 1 < len(sy) and sy[j] == a and sy[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(sy[j])
                    j += 1
            new[tok] = tuple(out)
        seqs = new

    expect = {}
    for r in docs:
        words = [w for w in r.text.strip().lower().split() if w]
        if not words:
            continue
        n_sub = sum(len(seqs[w]) for w in words)
        expect[r.doc_id] = (len(words), n_sub, (100 * n_sub) // len(words))

    got = {
        r.doc_id: (r.n_words, r.n_subwords, r.subwords_per_100w)
        for r in QUERIES["x_bpe_apply"].spark(spark, SF).collect()
    }
    assert got == expect
