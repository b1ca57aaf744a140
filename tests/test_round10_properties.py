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


def test_capped_pair_stage_contract(spark):
    """r11 pair-stage contract (_capped_pair_cos) on the real corpus
    with a tiny cap (3) so the overflow gate fires:

    - SPLIT-ONLY: every candidate pair shares the big (house) cell, so
      the capped candidate set is a subset of the exact twin's;
    - NO STARVATION: every member pairs with EVERY top-cap anchor of
      its big cell, regardless of id order (the r10 defect paired
      members only with smaller-id anchors);
    - BUDGET: pairs <= (1 + nprobe) * cap * N;
    - canonical form: i < j, no self pairs, no duplicates."""
    from realtime_banking_cdc_pipeline_spark.functions.similarity import (
        fixed_point,
        fx_dot,
    )
    from realtime_banking_cdc_pipeline_spark.queries.llmdata import _emb
    from realtime_banking_cdc_pipeline_spark.queries.round6b import (
        _two_level_cells,
    )
    from realtime_banking_cdc_pipeline_spark.queries.round9 import (
        _MKNN_NPROBE,
        _capped_pair_cos,
    )

    reps = _emb(spark, SF).select("vec_id", "embedding")
    emb, cells = _two_level_cells(spark, reps)
    m = (
        cells.select("vec_id", "cid", "ccos")
        .join(emb, "vec_id")
        .withColumn("nn", fx_dot(F.col("embedding"), F.col("embedding")))
    )
    cap = 3
    pairs = _capped_pair_cos(spark, reps, m, cap, _MKNN_NPROBE)
    rows = pairs.collect()
    got = {(r.i, r.j) for r in rows}
    assert len(rows) == len(got)  # deduped
    assert all(r.i < r.j for r in rows)

    cell_of = {r.vec_id: r.cid for r in cells.collect()}
    # split-only: every pair shares the big cell
    assert all(cell_of[i] == cell_of[j] for i, j in got)

    # no starvation: every member x every top-cap anchor of its cell
    ranked = sorted(
        ((r.cid, -r.ccos, r.vec_id) for r in cells.collect()),
    )
    from collections import defaultdict

    per_cell = defaultdict(list)
    for cid, negc, vid in ranked:
        per_cell[cid].append(vid)
    for cid, members in per_cell.items():
        anchors = members[:cap]
        for v in members:
            for a in anchors:
                if a != v:
                    assert (min(a, v), max(a, v)) in got

    n = reps.count()
    assert len(got) <= (1 + _MKNN_NPROBE) * cap * n
