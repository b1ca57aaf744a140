"""Scale-shape assertions: the plans we ship are the plans we'd want on
a 1000-executor cluster — broadcasts where intended, pushdown reaching
scans, skew helpers correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_banking_cdc_pipeline_spark.operators.skew import (
    salted_join,
    skewproof_distinct_count,
)
from realtime_banking_cdc_pipeline_spark.plans.plan_checks import (
    assert_broadcast_join,
    assert_pruned_scan,
    assert_pushed_filter,
    shuffle_count,
)
from realtime_banking_cdc_pipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def test_j2_broadcasts_dims_and_pushes_filters(spark):
    df = QUERIES["j2_two_hop_join"].spark(spark, SF)
    assert_broadcast_join(df, min_count=2)
    assert_pushed_filter(df, "o_orderdate")
    # lineitem has 16 cols; the query needs 3
    assert_pruned_scan(df, table_cols=16, max_read_cols=3)


def test_q01_pushes_shipdate_filter(spark):
    df = QUERIES["q01_pricing_summary"].spark(spark, SF)
    assert_pushed_filter(df, "l_shipdate")


def test_single_shuffle_operators(spark):
    # dedup-latest and minhash signatures are one-exchange plans
    assert shuffle_count(QUERIES["w1_dedup_latest"].spark(spark, SF)) == 1
    assert shuffle_count(QUERIES["x_minhash_signature"].spark(spark, SF)) == 1


def test_salted_join_matches_plain_join(spark):
    # one hot key (90% of rows) + uniform tail
    left = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("attr")
    )
    plain = left.join(right, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    ).collect()[0]
    salted = salted_join(left, right, "k", salt_buckets=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_skewproof_distinct_count(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 97).alias("x")
    )
    want = {
        (r["g"], r["nd"])
        for r in df.groupBy("g").agg(F.countDistinct("x").alias("nd")).collect()
    }
    got = {
        (r["g"], r["n_distinct"])
        for r in skewproof_distinct_count(df, ["g"], "x").collect()
    }
    assert got == want
