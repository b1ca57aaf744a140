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
