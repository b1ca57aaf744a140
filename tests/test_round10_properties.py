"""Round-10 property pins.

x_mutual_knn_clusters became contraction-first (r9 verdict directive
#1): the kNN graph is built over DISTINCT fixed-point embeddings and
contracted replica groups expand back afterward. Two invariants gate
that rewrite:

1. On duplicate-free data the contraction is a no-op — the result must
   be IDENTICAL to the pre-contraction pipeline (re-derived inline
   here from the same house helpers the old body used).
2. On replicated data every family member inherits its
   representative's cell/cluster, degrees shift by exactly
   +(group_size - 1), and the representative-level projection equals
   the query run on the distinct-only fixture.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.vec_id, r.cell, r.cluster, r.mutual_degree)
        for r in df.collect()
    )


def _uncontracted_mknn(spark, emb_df):
    """The pre-r10 x_mutual_knn_clusters pipeline (cell-bounded pairs
    over RAW vectors, no contraction) — kept here as the semantics
    reference for the duplicate-free identity pin."""
    from realtime_banking_cdc_pipeline_spark.caching import track_persist
    from realtime_banking_cdc_pipeline_spark.functions.similarity import fx_dot
    from realtime_banking_cdc_pipeline_spark.operators.components import (
        connected_components,
    )
    from realtime_banking_cdc_pipeline_spark.queries.round6b import (
        _two_level_cells,
    )
    from realtime_banking_cdc_pipeline_spark.queries.round9 import _MKNN_K

    emb, cells = _two_level_cells(spark, emb_df)
    m = track_persist(
        cells.select("vec_id", "cid")
        .join(emb, "vec_id")
        .select("vec_id", "cid", "embedding")
        .withColumn("nn", fx_dot(F.col("embedding"), F.col("embedding")))
    )
    a = m.select(
        F.col("cid").alias("ca"), F.col("vec_id").alias("i"),
        F.col("embedding").alias("ea"), F.col("nn").alias("na"),
    )
    b = m.select(
        F.col("cid").alias("cb"), F.col("vec_id").alias("j"),
        F.col("embedding").alias("eb"), F.col("nn").alias("nb"),
    )
    pair_cos = fx_dot(F.col("eb"), F.col("ea")).cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    pcos = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("i") < F.col("j")))
        .select("i", "j", pair_cos.alias("cos"))
    )
    directed = pcos.select(
        F.col("i").alias("a"), F.col("j").alias("b"), "cos"
    ).unionByName(
        pcos.select(F.col("j").alias("a"), F.col("i").alias("b"), "cos")
    )
    w = Window.partitionBy("a").orderBy(F.col("cos").desc(), F.col("b").asc())
    knn = (
        directed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MKNN_K)
        .select("a", "b")
    )
    mutual = track_persist(
        knn.alias("x")
        .join(
            knn.alias("y"),
            (F.col("y.a") == F.col("x.b")) & (F.col("y.b") == F.col("x.a")),
        )
        .filter(F.col("x.a") < F.col("x.b"))
        .select(F.col("x.a").alias("i"), F.col("x.b").alias("j"))
    )
    comp = connected_components(
        mutual, src="i", dst="j", nodes=m.select("vec_id")
    ).withColumnRenamed("id", "vec_id").withColumnRenamed(
        "component", "cluster"
    )
    deg = (
        mutual.select(F.col("i").alias("vec_id"))
        .unionAll(mutual.select(F.col("j").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("mutual_degree"))
    )
    return (
        m.select("vec_id", F.col("cid").alias("cell"))
        .join(comp, "vec_id")
        .join(deg, "vec_id", "left_outer")
        .select(
            "vec_id", "cell", "cluster",
            F.coalesce(F.col("mutual_degree"), F.lit(0))
            .cast("bigint")
            .alias("mutual_degree"),
        )
    )


def test_mutual_knn_identity_on_duplicate_free_fixture(spark):
    """sf0.001 embeddings carry no exact duplicates (checked), so the
    contracted query must equal the uncontracted reference row for
    row — the r9 verdict's done-criterion for the rewrite."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    digests = emb.select(
        F.md5(F.concat_ws(",", F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * (1 << 20))
            .cast("long").cast("string"),
        ))).alias("d")
    )
    assert digests.distinct().count() == emb.count(), "fixture premise"

    got = _rows(QUERIES["x_mutual_knn_clusters"].spark(spark, SF))
    want = _rows(_uncontracted_mknn(spark, emb))
    assert got == want


def test_mutual_knn_replica_expansion(spark, tmp_path):
    """Replicate each of the first 120 vectors 3x at offset ids: every
    family shares its rep's cell/cluster, member degrees are
    rep_degree + 3, and the rep-level projection is exactly the
    distinct-only result."""
    base = (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .filter(F.col("vec_id") < 120)
    )
    dup_dir = str(tmp_path / "dup")
    distinct_dir = str(tmp_path / "distinct")
    base.write.parquet(os.path.join(distinct_dir, "embeddings.parquet"))
    dups = base
    for off in (10_000, 20_000, 30_000):
        dups = dups.unionByName(
            base.withColumn("vec_id", F.col("vec_id") + off)
        )
    dups.write.parquet(os.path.join(dup_dir, "embeddings.parquet"))

    q = QUERIES["x_mutual_knn_clusters"].spark
    got = {r.vec_id: r for r in q(spark, dup_dir).collect()}
    ref = {r.vec_id: r for r in q(spark, distinct_dir).collect()}
    assert len(got) == 480 and len(ref) == 120

    for vid, r in ref.items():
        family = [got[vid + off] for off in (0, 10_000, 20_000, 30_000)]
        assert {f.cell for f in family} == {r.cell}
        assert {f.cluster for f in family} == {r.cluster}
        # distinct-level degree r.mutual_degree, +3 replica neighbors
        assert {f.mutual_degree for f in family} == {r.mutual_degree + 3}


def test_mutual_knn_capped_identity_below_cap(spark):
    """x_mutual_knn_capped == x_mutual_knn_clusters when no cell holds
    more than _SEM_CAP distinct embeddings (sf0.001: 500 vectors over
    >= 16 cells, max cell far below 64) — the same identical-below-cap
    contract the SemDeDup capped family pins."""
    got = _rows(QUERIES["x_mutual_knn_capped"].spark(spark, SF))
    want = _rows(QUERIES["x_mutual_knn_clusters"].spark(spark, SF))
    assert got == want


def test_capped_candidates_symmetric_and_multiprobe(spark):
    """r11 pair-stage contract (_capped_candidates): symmetric anchor
    pairing + multi-probe overflow rescue, on a hand-built cell
    assignment that bypasses the quantizer.

    Fixture: cell 0 holds 6 members (cap=2 -> anchors {10, 11} by
    (ccos DESC, vec_id ASC); note member 5 has a SMALLER id than both
    anchors — the r10 starvation case), cell 1 holds 2 (below cap).
    Overflow members of cell 0 probe cells {0, 1}; everyone else
    probes only home."""
    from realtime_banking_cdc_pipeline_spark.queries.round9 import (
        _capped_candidates,
    )

    # (vec_id, cid, ccos); embedding/nn irrelevant to pair generation
    m = spark.createDataFrame(
        [
            (10, 0, 0.99), (11, 0, 0.98), (5, 0, 0.97),
            (20, 0, 0.90), (21, 0, 0.80), (22, 0, 0.70),
            (30, 1, 0.95), (31, 1, 0.94),
        ],
        "vec_id long, cid long, ccos double",
    )
    over = [5, 20, 21, 22]  # rank > 2 in cell 0
    probes = spark.createDataFrame(
        [(v, 0) for v in (10, 11, 30, 31)]
        + [(v, c) for v in over for c in (0, 1)],
        "vec_id long, cid long",
    )
    cap = 2
    got = {(r.i, r.j) for r in _capped_candidates(m, probes, cap).collect()}

    anchors0, anchors1 = {10, 11}, {30, 31}
    # every member of cell 0 pairs with BOTH its anchors — including
    # vec 5, whose id is below both (zero candidates under the r10
    # smaller-id-only rule)
    for v in (5, 20, 21, 22):
        for a in anchors0:
            assert (min(v, a), max(v, a)) in got
    assert (10, 11) in got  # anchors pair with each other
    # overflow members reach the probed cell's anchors
    for v in over:
        for a in anchors1:
            assert (min(v, a), max(v, a)) in got
    # cross-cell pairs exist ONLY between an overflow member and an
    # anchor of one of its probed cells — in-capset members of cell 0
    # (10, 11) never reach cell 1
    cell0, cell1 = {10, 11, 5, 20, 21, 22}, {30, 31}
    cross = {p for p in got if ({p[0], p[1]} & cell0) and ({p[0], p[1]} & cell1)}
    assert cross == {(min(v, a), max(v, a)) for v in over for a in anchors1}
    assert (30, 31) in got  # below-cap cell: full pair set
    # budget: <= (1 + nprobe) * cap * N, no self pairs, i < j
    assert all(i < j for i, j in got)
    assert len(got) <= (1 + 2) * cap * 8


def test_mutual_knn_capped_budget_bound(spark):
    """The capped twin's candidate-pair budget holds end-to-end on the
    real corpus: pairs <= (1 + nprobe) * cap * N_distinct."""
    from realtime_banking_cdc_pipeline_spark.queries.round6b import (
        _two_level_cells,
    )
    from realtime_banking_cdc_pipeline_spark.queries.round9 import (
        _MKNN_NPROBE,
        _capped_candidates,
    )
    from realtime_banking_cdc_pipeline_spark.functions.similarity import (
        fx_dot,
    )
    from realtime_banking_cdc_pipeline_spark.queries.llmdata import _emb

    reps = _emb(spark, SF).select("vec_id", "embedding")
    emb, cells, probes = _two_level_cells(
        spark, reps, fine_probes=_MKNN_NPROBE
    )
    m = (
        cells.select("vec_id", "cid", "ccos")
        .join(emb, "vec_id")
        .withColumn("nn", fx_dot(F.col("embedding"), F.col("embedding")))
    )
    cap = 3  # far below any sf0.001 cell -> exercises overflow + probes
    n = reps.count()
    pairs = _capped_candidates(m, probes, cap).count()
    assert pairs <= (1 + _MKNN_NPROBE) * cap * n
