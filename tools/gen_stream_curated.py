"""Curation-grade 2M-doc streaming fixture (r10 judge directive #7).

The r10 probe corpus (4 exact replicas of sf10p docs, ~40-token
vocabulary, md5-synth embeddings) made the composed chain's survivor
counts meaningless — the semantic gate dropped nearly everything, so
the 2M probe was latency-only. This generator plants duplicate
FAMILIES at known rates with a realistic vocabulary spread (30k-token
uniform synthetic vocab, 80-token docs) and explicit per-doc
embeddings, so expected-vs-actual survivor mass per gate is
assertable (tools/probe_pipeline_curated.py runs the assertions).

20 batches x 100k docs, ids = batch*10^9 + seq (strictly monotone =
the chain's batching-invariance precondition). Per-batch families by
seq range (batch 0 = all base):

  seq 0..69999        base       fresh unique text + unique embedding
  seq 70000..79999    exact      byte-copy of a batch-(i-1) base doc
                                 -> dies at the Bloom exact gate
  seq 80000..87499    para-part  first 2 blocks of a batch-(i-1) base
                                 + 2 fresh blocks -> survives REBUILT
                                 (2 of 4 paragraphs removed)
  seq 87500..89999    all-boiler first 3 blocks of a batch-(i-1) base
                                 (full text differs from the base, so
                                 the exact gate passes) -> every block
                                 dies, doc drops at the paragraph stage
  seq 90000..97499    near-dup   batch-(i-1) base with 1 token edited
                                 per 20-token block (no exact block, so
                                 para_match_min=16 passes it) -> dies
                                 at the doc-level MinHash gate at the
                                 banding catch rate (J~0.73, 4 bands of
                                 4: P(caught) ~ 0.74 — the LSH miss
                                 rate is part of the expectation)
  seq 97500..99999    semantic   fresh text + the embedding of an
                                 epoch-0 doc with seq < 5000 (first
                                 ~20 arrivals per cell -> anchors
                                 under per_cell_budget=64 w.h.p.) ->
                                 dies at the semantic gate (cos = 1).
                                 Batches 1..7 only (epoch 0 leaves the
                                 retention-8 horizon afterward);
                                 batches 8..19 carry base docs in this
                                 range instead.

Deterministic throughout (splitmix64 over (id, position)); no RNG
state, so regeneration is idempotent.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

OUT = "/root/repo/.localdata/stream_curated/src"
BATCHES = 20
PER = 100_000
VOCAB = 30_000
DOC_TOKENS = 80  # 4 paragraph blocks of 20
BLOCK = 20
DIM = 8

BASE_END = 70_000
EXACT_END = 80_000
PARA_END = 87_500
BOILER_END = 90_000
NEAR_END = 97_500
SEM_BATCHES = range(1, 8)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized, deterministic."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def base_token_ids(doc_key: int) -> np.ndarray:
    pos = np.arange(DOC_TOKENS, dtype=np.uint64)
    return (_mix(np.uint64(doc_key) * np.uint64(1_000_003) + pos) % np.uint64(VOCAB)).astype(np.int64)


def embedding_of(doc_key: int) -> list[float]:
    j = np.arange(DIM, dtype=np.uint64)
    h = _mix(np.uint64(doc_key) * np.uint64(777_767) + j)
    return [round(float(int(v % np.uint64(2001))) / 1000.0 - 1.0, 3) for v in h]


def doc_id(batch: int, seq: int) -> int:
    return batch * 1_000_000_000 + seq


def text_of(tok_ids: np.ndarray) -> str:
    return " ".join(f"w{t}" for t in tok_ids)


def make_batch(batch: int) -> list[tuple[int, str, list[float]]]:
    rows = []
    prev = batch - 1
    for seq in range(PER):
        did = doc_id(batch, seq)
        if batch == 0 or seq < BASE_END:
            rows.append((did, text_of(base_token_ids(did)), embedding_of(did)))
        elif seq < EXACT_END:
            target = doc_id(prev, seq - BASE_END)  # base seq 0..9999
            rows.append((did, text_of(base_token_ids(target)), embedding_of(did)))
        elif seq < PARA_END:
            target = doc_id(prev, 10_000 + (seq - EXACT_END))
            t = base_token_ids(target)[: 2 * BLOCK]
            fresh = base_token_ids(did)[: 2 * BLOCK]
            rows.append((did, text_of(np.concatenate([t, fresh])), embedding_of(did)))
        elif seq < BOILER_END:
            target = doc_id(prev, 17_500 + (seq - PARA_END))
            rows.append((did, text_of(base_token_ids(target)[: 3 * BLOCK]), embedding_of(did)))
        elif seq < NEAR_END:
            target = doc_id(prev, 20_000 + (seq - BOILER_END))
            t = base_token_ids(target).copy()
            # one mid-block edit per 20-token block: no block stays
            # byte-identical, doc-level Jaccard ~ 0.73
            for b in range(DOC_TOKENS // BLOCK):
                t[b * BLOCK + 7] = VOCAB + (did + b) % 1000
            rows.append((did, text_of(t), embedding_of(did)))
        else:
            if batch in SEM_BATCHES:
                target = doc_id(0, (batch * 625 + (seq - NEAR_END)) % 5_000)
                rows.append((did, text_of(base_token_ids(did)), embedding_of(target)))
            else:
                rows.append((did, text_of(base_token_ids(did)), embedding_of(did)))
    return rows


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for b in range(BATCHES):
        path = os.path.join(OUT, f"part-{b:03d}.json")
        with open(path, "w") as f:
            for did, text, emb in make_batch(b):
                f.write(json.dumps({"doc_id": did, "text": text, "embedding": emb}) + "\n")
        print("wrote", path, flush=True)


if __name__ == "__main__":
    sys.exit(main())
