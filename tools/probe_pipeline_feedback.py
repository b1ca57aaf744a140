"""Feedback-mode curated probe (r14 judge directive #4): the composed
pipeline over the first 6 curated-fixture files (600k docs) with the
plan-feedback admission gate, the drift-window plan and the per-epoch
sample ON. The main curated probe keeps feedback OFF so its
survivor-mass physics stay valid; this variant proves the loop
actually engages:

1. no admission at epoch 0 (no committed plan yet); admission stats
   present for every epoch >= 1;
2. the per-source rates obey the bounded law EXACTLY against the
   previous epoch's committed plan (recomputed here in pure python);
3. the deterministic md5 draw delivers n_admitted within a uniformity
   band of n_seen * rate / S per source;
4. at least one source is genuinely decayed (rate < S) once the plan
   has seen the skewed mix — the loop is steering, not idling;
5. the drift-window plan carries the decay columns and the epoch
   sample's quotas recompute from the DRIFTED mix (the largest-
   remainder law over the last epoch's plan);
6. survivor masses stay consistent: every gate survivor of epoch e>=1
   is an admitted doc of that epoch.
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
from realtime_banking_cdc_pipeline_spark.streaming.plan import (
    _ADMIT_FLOOR_FP,
    _PLAN_S,
    read_plan,
)

FIXTURE = os.environ.get(
    "PIPE_CURATED_SRC", "/root/repo/.localdata/stream_curated/src"
)
N_FILES = int(os.environ.get("PIPE_FEEDBACK_FILES", "6"))
SRC = "/tmp/pipe_feedback_src"
ROOT = "/tmp/pipe_feedback_root"
CKPT = "/tmp/pipe_feedback_ckpt"
for d in (SRC, ROOT, CKPT):
    shutil.rmtree(d, ignore_errors=True)
os.makedirs(SRC)
for name in sorted(os.listdir(FIXTURE))[:N_FILES]:
    os.link(os.path.join(FIXTURE, name), os.path.join(SRC, name))

spark = get_spark("pipe_feedback", shuffle_partitions=32)
batches = []


def done(epoch, sec, timings):
    batches.append(
        {"epoch": epoch, "sec": round(sec, 1),
         "stages": {k: round(v, 3) for k, v in timings.items()}}
    )
    print("BATCH", json.dumps(batches[-1]), flush=True)


# same source derivation as the main curated probe
_seq = F.pmod(F.col("doc_id"), F.lit(1_000_000_000))
_bat = (F.col("doc_id") / F.lit(1_000_000_000)).cast("long")
SRC_EXPR = (
    F.when(_bat == 0, "core")
    .when(_seq < 80_000, "core")
    .when(_seq < 87_500, "para_partial")
    .when(_seq < 90_000, "all_boiler")
    .when(_seq < 97_500, "near_dup")
    .otherwise(
        F.when((_bat >= 1) & (_bat <= 7), "semantic").otherwise("core")
    )
)

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
    para_match_min=16,
    with_coverage_monitor=True,
    semantic_threshold=0.999,
    plan_refresher_source=SRC_EXPR,
    plan_sample_per_epoch=5_000,
    plan_drift_window=4,
    plan_feedback=True,
    stagger_compaction=True,
    on_batch_done=done,
)
q.awaitTermination()
wall = time.time() - t0

out = _paths(ROOT)["out"]
last_e = batches[-1]["epoch"]

checks: dict = {}
checks["no_admission_at_epoch_0"] = not os.path.exists(
    os.path.join(out, "admission", "epoch=0")
)


def rate_law(share_fp: int, mix_ppm: int) -> int:
    if share_fp <= mix_ppm:
        return _PLAN_S
    return max(_ADMIT_FLOOR_FP, (_PLAN_S * mix_ppm) // share_fp)


adm_summary = []
law_ok, band_ok, decayed_any, present_ok = True, True, False, True
for e in range(1, last_e + 1):
    part = os.path.join(out, "admission", f"epoch={e}")
    if not os.path.exists(part):
        present_ok = False
        continue
    prev = {r.source: r for r in read_plan(spark, ROOT, e - 1).collect()}
    for r in spark.read.parquet(part).collect():
        pr = prev.get(r.source)
        # never-planned sources admit everything (pipeline does a
        # left_outer join + coalesce(rate_fp, S)); mirror that here
        want = _PLAN_S if pr is None else rate_law(pr.share_fp, pr.mix_ppm)
        if r.rate_fp != want:
            law_ok = False
        expect = r.n_seen * r.rate_fp / _PLAN_S
        if abs(r.n_admitted - expect) > 0.02 * r.n_seen + 50:
            band_ok = False
        if r.rate_fp < _PLAN_S:
            decayed_any = True
        adm_summary.append(
            {"epoch": e, "source": r.source, "rate_fp": int(r.rate_fp),
             "n_seen": int(r.n_seen), "n_admitted": int(r.n_admitted)}
        )
checks["admission_present_every_epoch_ge_1"] = present_ok
checks["rate_law_exact_vs_prev_plan"] = law_ok
checks["draw_uniformity_band"] = band_ok
checks["at_least_one_source_decayed"] = decayed_any

# drift columns + sample quota law over the DRIFTED mix
plan_last = {r.source: r for r in read_plan(spark, ROOT, last_e).collect()}
checks["plan_carries_drift_columns"] = all(
    hasattr(r, "drift_fp") and hasattr(r, "fresh_fp")
    for r in plan_last.values()
)
N = 5_000
q0 = {s: (N * p.mix_ppm) // _PLAN_S for s, p in plan_last.items()}
rem = {s: (N * p.mix_ppm) % _PLAN_S for s, p in plan_last.items()}
d = N - sum(q0.values())
bump = {
    s for s, _ in sorted(rem.items(), key=lambda kv: (-kv[1], kv[0]))[:d]
}
quota = {s: q0[s] + (1 if s in bump else 0) for s in plan_last}
sample = spark.read.parquet(
    os.path.join(out, "sample", f"epoch={last_e}")
).collect()
checks["sample_quotas_follow_drifted_mix"] = all(
    r.src_quota == quota[r.source] for r in sample
)

# survivors of each feedback epoch are admitted docs of that epoch
ok = True
for e in range(1, last_e + 1):
    part = os.path.join(out, "admission", f"epoch={e}")
    if not os.path.exists(part):
        continue
    surv = spark.read.parquet(
        os.path.join(out, "survivors", f"epoch={e}")
    ).select("doc_id")
    # reconstruct admitted set from the draw (deterministic md5)
    batch_file = sorted(os.listdir(SRC))[e]
    raw = spark.read.json(
        os.path.join(SRC, batch_file),
        schema="doc_id bigint, text string, embedding array<float>",
    ).select("doc_id", SRC_EXPR.alias("source"))
    rates = spark.read.parquet(part).select("source", "rate_fp")
    from realtime_banking_cdc_pipeline_spark.streaming.plan import (
        admission_draw,
    )

    admitted = raw.join(F.broadcast(rates), "source").filter(
        admission_draw(F.col("doc_id")) < F.col("rate_fp")
    )
    n_bad = surv.join(admitted.select("doc_id"), "doc_id", "left_anti").count()
    if n_bad:
        ok = False
checks["survivors_subset_of_admitted"] = ok

result = {
    "wall_sec": round(wall, 1),
    "docs": N_FILES * 100_000,
    "docs_per_sec": round(N_FILES * 100_000 / wall, 0),
    "checks": checks,
    "all_checks_pass": all(checks.values()),
    "admission": adm_summary,
    "batches": batches,
}
print("RESULT", json.dumps(result), flush=True)
if len(sys.argv) > 1:
    with open(sys.argv[1], "w") as fh:
        json.dump(result, fh, indent=1)
