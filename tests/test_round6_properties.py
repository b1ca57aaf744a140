"""Round-6 op invariants against brute force (engine-independent — the
DuckDB oracle checks Spark-vs-SQL; these check both against numpy)."""

from __future__ import annotations

import math

import numpy as np

from realtime_banking_cdc_pipeline_spark.queries.registry import QUERIES
from realtime_banking_cdc_pipeline_spark.queries.round6b import (
    _IVF_CENTROIDS,
    _SEMDEDUP_THRESHOLD,
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
    # cell assignment: max cosine, tiebreak lowest centroid id
    cents = {i: emb[i] for i in range(_IVF_CENTROIDS) if i in emb}
    cell = {
        v: max(cents, key=lambda c: (_cos(e, cents[c]), -c))
        for v, e in emb.items()
    }
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
