"""Streaming DDSketch quantile store (streaming/metrics.py).

Same additive-state exactly-once contract as the CMS store (epoch-keyed
partition overwrite, base subsumption on read, strictly-earlier
compaction), with stream-fold ≡ batch-histogram parity as the headline
invariant: the streamed store's folded bins must EQUAL the histogram
dds_bins builds over the concatenated corpus, and the quantile reads
must stay inside the 1/16 relative-error bound against exact order
statistics.
"""

from __future__ import annotations

import json as _json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from realtime_banking_cdc_pipeline_spark.functions.sketches import (
    dds_bins,
    dds_quantiles,
)
from realtime_banking_cdc_pipeline_spark.streaming.metrics import (
    compact_dds_store,
    read_dds_quantiles,
    read_dds_store,
    start_quantile_monitor,
    update_dds_store,
)

SF = "/root/testdata/sf0.001"

_QS = [1, 50, 90, 99]


def _orders(spark):
    return spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey",
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
        ).alias("cents"),
    )


def _bins_dict(df):
    return {r.idx: r.cnt for r in df.collect()}


def test_streamed_dds_store_matches_batch_histogram(spark, tmp_path):
    o = _orders(spark).cache()
    batch = _bins_dict(dds_bins(o, "cents"))

    store = str(tmp_path / "dds")
    thirds = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    for i, t in enumerate(thirds):
        update_dds_store(t, store, "cents", epoch_id=i)
    assert _bins_dict(read_dds_store(spark, store)) == batch

    # replay idempotence: re-folding an epoch changes nothing
    update_dds_store(thirds[1], store, "cents", epoch_id=1)
    assert _bins_dict(read_dds_store(spark, store)) == batch

    # quantile reads: lower-bound side and the 1/16 geometric bound
    # against exact order statistics over the full corpus
    cents = sorted(r.cents for r in o.collect())
    n = len(cents)
    for r in read_dds_quantiles(spark, store, _QS).collect():
        k = (r.q_pct * n + 99) // 100
        exact = cents[k - 1]
        assert 0 < r.est <= exact
        assert (exact - r.est) / exact <= 1 / 16


def test_dds_compaction_base_subsumption(spark, tmp_path):
    o = _orders(spark)
    store = str(tmp_path / "dds")
    parts = [o.filter(F.col("o_orderkey") % 4 == i) for i in range(4)]
    for i, t in enumerate(parts):
        update_dds_store(t, store, "cents", epoch_id=i)
    before = _bins_dict(read_dds_store(spark, store))

    compact_dds_store(spark, store, epoch_id=3)
    assert _bins_dict(read_dds_store(spark, store)) == before

    # a leftover subsumed partition (crash mid-delete) must be ignored
    # by base subsumption, never double-counted
    dds_bins(parts[0], "cents").write.mode("overwrite").parquet(
        os.path.join(store, "epoch=0")
    )
    assert _bins_dict(read_dds_store(spark, store)) == before

    # a replayed compaction epoch never rewrites the committed base
    compact_dds_store(spark, store, epoch_id=3)
    assert _bins_dict(read_dds_store(spark, store)) == before


def test_quantile_monitor_stream_wiring(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [{"v": int(v)} for v in range(100, 1100)]
    for i in range(4):
        with open(src / f"part{i}.json", "w") as f:
            for r in rows[i * 250 : (i + 1) * 250]:
                f.write(_json.dumps(r) + "\n")

    store = str(tmp_path / "dds")
    schema = StructType([StructField("v", LongType())])
    q = start_quantile_monitor(
        spark,
        str(src),
        store,
        str(tmp_path / "ckpt"),
        schema,
        value_expr="v",
        compact_every=2,
    )
    q.awaitTermination(120)

    batch = _bins_dict(
        dds_bins(
            spark.createDataFrame([(r["v"],) for r in rows], "v long"), "v"
        )
    )
    assert _bins_dict(read_dds_store(spark, store)) == batch
    est = {r.q_pct: r.est for r in read_dds_quantiles(spark, store, _QS).collect()}
    # values 100..1099: p50 exact order statistic = value at rank
    # ceil(0.5*1000) = 500 -> 599
    assert 0 < est[50] <= 599 and (599 - est[50]) / 599 <= 1 / 16


def test_dds_bins_filters_negative_values(spark):
    """r8-ADVICE low: bin(v) of a negative bigint is the 64-char
    two's-complement string — negatives must be filtered inside
    dds_bins (visible missing mass), not fed into the shift arithmetic
    (silent histogram corruption). Zero and positives keep exact bins."""
    from realtime_banking_cdc_pipeline_spark.functions.sketches import dds_bins

    df = spark.createDataFrame(
        [(-5,), (-1,), (0,), (1,), (31,), (32,), (1000,)], "v long"
    )
    bins = {r.idx: r.cnt for r in dds_bins(df, "v").collect()}
    assert sum(bins.values()) == 5          # the two negatives dropped
    assert bins[0] == 1 and bins[1] == 1    # unit bins exact
    assert all(idx >= 0 for idx in bins)    # no corrupt indices
