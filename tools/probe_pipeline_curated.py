"""Curated 2M-doc composed-pipeline probe (r10 judge directives #3+#7):
runs the six-store chain (now including the paragraph stage) over the
planted-family corpus from tools/gen_stream_curated.py and asserts
expected-vs-actual survivor mass PER GATE, plus per-batch stage
timings and the exact gate's bloom fill telemetry.

Expected (N = 2,000,000; family maths in gen_stream_curated.py).
Tolerances calibrated by the first full run (r11):
  exact plants (190k)      -> 0 survivors (one-sided Bloom guarantee;
                              strict)
  all-boiler plants (47.5k)-> ~0 survivors; the only leak path is an
                              upstream Bloom fp killing the TARGET in
                              its own batch (measured: 1 of 47.5k);
                              assert <= 10
  semantic plants (17.5k)  -> ~0 survivors (cos=1 vs an epoch-0 cell
                              anchor; targets seq < 5000 keep every
                              cell's arrival count well under the
                              64-anchor budget); assert kill >= 0.99
  para-partial (142.5k)    -> survive REBUILT with exactly 2 of 4
                              paragraphs removed; leak path = Bloom fp
                              on target or self; assert >= 0.999
  near-dup plants (142.5k) -> die at the doc MinHash gate at the
                              banding catch rate: J~0.73, 4 bands of
                              4 rows => P(caught) ~ 0.74 (measured
                              0.732); assert in [0.60, 0.92]
  base (1.46M)             -> survive; background kill is the
                              semantic gate's 8-dim density (at 1.46M
                              random 8-dim vectors, ~0.4% have a
                              cos >= 0.99 neighbor — measured, hence
                              threshold 0.999 where the background is
                              ~(1-0.999^2)^3.5 ~ 4e-10) plus Bloom fp
                              ~6e-5; assert >= 0.999
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.session import get_spark
from realtime_banking_cdc_pipeline_spark.streaming.pipeline import (
    _paths,
    start_pipeline_ingest,
)

SRC = "/root/repo/.localdata/stream_curated/src"
ROOT = "/tmp/pipe_curated_root"
CKPT = "/tmp/pipe_curated_ckpt"
for d in (ROOT, CKPT):
    shutil.rmtree(d, ignore_errors=True)

spark = get_spark("pipe_curated", shuffle_partitions=32)
batches = []


def done(epoch, sec, timings):
    batches.append(
        {
            "epoch": epoch,
            "sec": round(sec, 1),
            "stages": {
                k: round(v, 3) for k, v in timings.items()
            },
        }
    )
    print("BATCH", json.dumps(batches[-1]), flush=True)


t0 = time.time()
q = start_pipeline_ingest(
    spark,
    SRC,
    ROOT,
    CKPT,
    "doc_id bigint, text string, embedding array<float>",
    max_files_per_trigger=1,
    compact_every=8,
    retention_epochs=8,
    bloom_bits=1 << 26,
    per_cell_budget=64,
    para_match_min=16,   # paragraph gate = exact-block-only for this corpus
    with_coverage_monitor=True,   # r12: record vocabulary-novelty decay
    semantic_threshold=0.999,
    on_batch_done=done,
)
q.awaitTermination()
wall = time.time() - t0

surv = spark.read.parquet(os.path.join(_paths(ROOT)["out"], "survivors"))
seq = F.pmod(F.col("doc_id"), F.lit(1_000_000_000))
batch = (F.col("doc_id") / F.lit(1_000_000_000)).cast("long")
fam = (
    F.when(batch == 0, "base")
    .when(seq < 70_000, "base")
    .when(seq < 80_000, "exact")
    .when(seq < 87_500, "para_partial")
    .when(seq < 90_000, "all_boiler")
    .when(seq < 97_500, "near_dup")
    .otherwise(
        F.when((batch >= 1) & (batch <= 7), "semantic").otherwise("base")
    )
)
got = {
    r.fam: r.n
    for r in surv.select(fam.alias("fam"))
    .groupBy("fam")
    .agg(F.count(F.lit(1)).alias("n"))
    .collect()
}
totals = {
    "base": 100_000 + 19 * 70_000 + 12 * 2_500,
    "exact": 19 * 10_000,
    "para_partial": 19 * 7_500,
    "all_boiler": 19 * 2_500,
    "near_dup": 19 * 7_500,
    "semantic": 7 * 2_500,
}

# paragraph accounting for the para-partial family
acc = spark.read.parquet(os.path.join(_paths(ROOT)["out"], "paragraph"))
pp_acc = (
    acc.filter(
        (F.pmod(F.col("doc_id"), F.lit(1_000_000_000)) >= 80_000)
        & (F.pmod(F.col("doc_id"), F.lit(1_000_000_000)) < 87_500)
        & (F.col("doc_id") >= 1_000_000_000)
    )
    .agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_paras") == 4).cast("long")).alias("n4"),
        F.sum((F.col("n_paras_removed") == 2).cast("long")).alias("r2"),
    )
    .first()
)

checks = {
    "exact_killed": got.get("exact", 0) == 0,
    "all_boiler_killed": got.get("all_boiler", 0) <= 10,
    "semantic_kill_ge_0.99": got.get("semantic", 0)
    <= 0.01 * totals["semantic"],
    "para_partial_survive_ge_0.999": got.get("para_partial", 0)
    >= 0.999 * totals["para_partial"],
    "para_partial_accounting": (
        pp_acc.n >= 0.999 * totals["para_partial"]
        and pp_acc.n4 == pp_acc.n
        and pp_acc.r2 >= 0.999 * pp_acc.n
    ),
    "base_survival_ge_0.999": got.get("base", 0)
    >= 0.999 * totals["base"],
    "near_dup_kill_in_band": 0.60
    <= 1 - got.get("near_dup", 0) / totals["near_dup"]
    <= 0.92,
}
cov = sorted(
    (
        (r.epoch, r.n_new, round(r.novelty_rate, 4), r.vocab_size)
        for r in spark.read.parquet(
            os.path.join(_paths(ROOT)["out"], "coverage")
        ).collect()
    )
)
result = {
    "wall_sec": round(wall, 1),
    "docs": 20 * 100_000,
    "docs_per_sec": round(20 * 100_000 / wall, 0),
    "survivors_total": surv.count(),
    "survivors_by_family": got,
    "expected_totals": totals,
    "near_dup_kill_rate": round(
        1 - got.get("near_dup", 0) / totals["near_dup"], 4
    ),
    "base_survival_rate": round(got.get("base", 0) / totals["base"], 5),
    "checks": checks,
    "all_checks_pass": all(checks.values()),
    "batch1_sec": batches[0]["sec"],
    "worst_batch_sec": max(b["sec"] for b in batches),
    "coverage_epochs": [
        {"epoch": e, "n_new": n, "novelty": nv, "vocab": v}
        for e, n, nv, v in cov
    ],
    "batches": batches,
}
print("RESULT", json.dumps(result), flush=True)
