"""Core relational operator queries (SURVEY.md §2.2-2.6, §2.11) over the
driver's TPC-H-ish testdata, each with a DuckDB oracle.

The banking-operator ↔ testdata analogies follow FIXTURES.md §4:
dedup-latest over ``events`` ≈ staging dedup (W1); ``orders⟕customer``
≈ fact→dim join (J1); anti-join orphan checks (J3/T4/T5); windowed
aggregates over ``events.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_io import read_table
from ._det import dec, dsum, dsum_r2, events_table
from .registry import query

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape — A-aggregates + P-expressions;
# the reference's heaviest Gold pattern: scan → filter → group → many aggs)
# ---------------------------------------------------------------------------

_Q01_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
    AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
           * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query(
    "q01_pricing_summary",
    _Q01_SQL,
    doc="Flagship scan→filter→groupBy→multi-agg (A2/A4 analog; TPC-H Q1 shape).",
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(4,2)")
    qty = dec("l_quantity", 12, 2)
    price = dec("l_extendedprice", 12, 2)
    disc = dec("l_discount", 4, 2)
    tax = dec("l_tax", 4, 2)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(qty, "sum_qty"),
            dsum(price, "sum_base_price"),
            dsum_r2(price * (one - disc), "sum_disc_price"),
            dsum_r2(price * (one - disc) * (one + tax), "sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# W1 — dedup-latest (the reference's workhorse; stg_customers.sql:11-14,26)
# ---------------------------------------------------------------------------

_W1_SQL = """
SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@query(
    "w1_dedup_latest",
    _W1_SQL,
    doc="W1 dedup-latest with deterministic (ts, event_id) tiebreak.",
    bench=True,
)
def w1_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_latest

    ev = events_table(spark, sf_dir)
    return dedup_latest(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", "value", "ts"
    )


# ---------------------------------------------------------------------------
# J1 — fact ⟕ dim join + aggregate (fact_transactions.sql:13-15 analog)
# ---------------------------------------------------------------------------

_J1_SQL = """
SELECT
  c.c_mktsegment AS mktsegment,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@query(
    "j1_fact_dim_join",
    _J1_SQL,
    doc="J1 left equi-join fact→dim (broadcast) + revenue rollup.",
    bench=True,
)
def j1_fact_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            dsum(dec("o_totalprice", 12, 2), "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# J2 — multi-hop join to dims with predicate (readme.md:585-599 analog)
# ---------------------------------------------------------------------------

_J2_SQL = """
SELECT
  n.n_name AS nation,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY n.n_name
"""


@query(
    "j2_two_hop_join",
    _J2_SQL,
    doc="J2 chained joins fact→dim→dim with filter pushdown; dims broadcast.",
    bench=True,
)
def j2_two_hop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum_r2(
                dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 4, 2)),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J3/T4/T5 — anti-join integrity probes (readme.md:205-216)
# ---------------------------------------------------------------------------

_J3_SQL = """
SELECT COUNT(*) AS n_orphans FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
"""


@query(
    "j3_anti_orphans",
    _J3_SQL,
    doc="J3 left-anti orphan probe (expect 0).",
)
def j3_anti_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    orphans = li.join(orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


# ---------------------------------------------------------------------------
# J5 — self-join (related_account_id transfer-counterparty analog)
# ---------------------------------------------------------------------------

_J5_SQL = """
SELECT
  COUNT(*) AS n_pairs,
  COUNT(DISTINCT a.l_orderkey) AS n_multi_item_orders
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
"""


@query(
    "j5_self_join",
    _J5_SQL,
    doc="J5 self-referential join (transfer counterparty analog): co-order line pairs.",
)
def j5_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct(F.col("a.l_orderkey")).alias("n_multi_item_orders"),
    )


# ---------------------------------------------------------------------------
# A1 — GROUP BY + HAVING probe (SCD uniqueness invariant shape)
# ---------------------------------------------------------------------------

_A1_SQL = """
SELECT user_id, event_type, COUNT(*) AS n
FROM events
GROUP BY user_id, event_type
HAVING COUNT(*) > 25
"""


@query(
    "a1_having_probe",
    _A1_SQL,
    doc="A1 GROUP BY + HAVING uniqueness-style probe (readme.md:218-224 shape).",
)
def a1_having_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 25)
    )


# ---------------------------------------------------------------------------
# A3 — high-water mark
# ---------------------------------------------------------------------------

_A3_SQL = """
SELECT CAST(MAX(ts) AS TIMESTAMP) AS hwm, COUNT(*) AS n_rows FROM events
"""


@query(
    "a3_high_water_mark",
    _A3_SQL,
    doc="A3 MAX high-water mark for incremental loads (readme.md:598).",
)
def a3_high_water_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return ev.agg(F.max("ts").alias("hwm"), F.count(F.lit(1)).alias("n_rows"))


# ---------------------------------------------------------------------------
# A5 — z-score anomaly detection (readme.md:252,403-404)
# ---------------------------------------------------------------------------

# Exact decimal sums per group, then identical double arithmetic in both
# engines → bit-identical z-scores (see queries/_det.py).
_A5_SQL = """
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sq,
         COUNT(*) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - s.s / s.n) / sqrt((s.sq - s.s * s.s / s.n) / (s.n - 1)) AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE abs((e.value - s.s / s.n) / sqrt((s.sq - s.s * s.s / s.n) / (s.n - 1))) > 3.0
"""


@query(
    "a5_zscore_anomalies",
    _A5_SQL,
    doc="A5 z-score anomaly detection via exact group moments.",
    bench=True,
)
def a5_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    v = dec("value", 18, 2)
    stats = ev.groupBy("event_type").agg(
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    z = (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(
        (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    return (
        j.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 3.0)
        .select("event_id", "event_type", "value", "zscore")
    )


# ---------------------------------------------------------------------------
# A6 — argmax-per-key via max_by (dedup-latest as an aggregate)
# ---------------------------------------------------------------------------

# Recency key as a zero-padded (epoch_us, event_id) string: unique,
# lexicographically ordered identically in both engines, overflow-free.
_A6_SQL = """
SELECT user_id,
       arg_max(event_type,
               lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_event_type,
       MAX(lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_order_key
FROM events
GROUP BY user_id
"""


@query(
    "a6_argmax_latest",
    _A6_SQL,
    doc="A6 argmax-per-key (max_by) — aggregate form of W1, partial-agg (map-side combine) beats the window shuffle at scale.",
)
def a6_argmax_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    okey = F.concat(
        F.lpad(F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", okey).alias("last_event_type"),
        F.max(okey).alias("last_order_key"),
    )


# ---------------------------------------------------------------------------
# O1 — global top-K (TakeOrdered, no full sort)
# ---------------------------------------------------------------------------

_O1_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


@query(
    "o1_top10_orders",
    _O1_SQL,
    doc="O1 ORDER BY ... LIMIT (readme.md:388-394) — executed as TakeOrdered.",
)
def o1_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# W — top-K per group (ops/fraud analytics shape)
# ---------------------------------------------------------------------------

_WTK_SQL = """
SELECT mktsegment, o_orderkey, o_totalprice, rnk FROM (
  SELECT c.c_mktsegment AS mktsegment, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rnk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rnk <= 3
"""


@query(
    "w_topk_per_group",
    _WTK_SQL,
    doc="Top-K per group via ranked window (readme.md:388-394 per-segment form).",
)
def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import top_k_per_group

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("mktsegment"), "o_orderkey", "o_totalprice"
    )
    ranked = top_k_per_group(
        j, ["mktsegment"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3, "rnk"
    )
    return ranked.select("mktsegment", "o_orderkey", "o_totalprice", "rnk")


# ---------------------------------------------------------------------------
# P — scalar expression suite (P1/P2/P5/P6/P8/P9, §2.9 function surface)
# ---------------------------------------------------------------------------

_PS_SQL = """
SELECT
  o_orderkey,
  CAST(o_orderkey AS VARCHAR) AS order_id_str,
  string_split(o_orderpriority, '-')[2] AS priority_word,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
  CAST(year(o_orderdate) AS INT) AS order_year,
  CASE WHEN o_orderstatus = 'O' THEN 'open'
       WHEN o_orderstatus = 'F' THEN 'finished'
       ELSE 'partial' END AS status_label,
  CAST(FLOOR(CAST(o_totalprice AS DECIMAL(12,2)) / 1000) AS BIGINT) AS price_bucket,
  upper(o_orderpriority) AS priority_upper
FROM orders
WHERE o_totalprice > 1000.0
"""


@query(
    "p_scalar_suite",
    _PS_SQL,
    doc="P1/P2/P5-P9 scalar surface: casts, split, date_format, CASE WHEN, bucketing.",
)
def p_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_totalprice") > 1000.0).select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("order_id_str"),
        F.split(F.col("o_orderpriority"), "-").getItem(1).alias("priority_word"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("partial")
        .alias("status_label"),
        F.floor(dec("o_totalprice", 12, 2) / 1000).cast("bigint").alias("price_bucket"),
        F.upper("o_orderpriority").alias("priority_upper"),
    )


# ---------------------------------------------------------------------------
# T1-T3 — data-quality violation counts (expect zeros)
# ---------------------------------------------------------------------------

_TQ_SQL = """
SELECT
  (SELECT COUNT(*) FROM (
     SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
  )) AS dup_keys,
  (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS null_custkeys,
  (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS non_positive_prices
"""


@query(
    "t_quality_checks",
    _TQ_SQL,
    doc="T1 unique / T2 not_null / T3 positive_amount as violation counts (readme.md:196-208).",
)
def t_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import (
        violations_duplicate_key,
        violations_non_positive,
        violations_null,
    )

    orders = read_table(spark, sf_dir, "orders")
    dup = violations_duplicate_key(orders, ["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("dup_keys")
    )
    nulls = violations_null(orders, ["o_custkey"]).agg(
        F.count(F.lit(1)).alias("null_custkeys")
    )
    nonpos = violations_non_positive(orders, "o_totalprice").agg(
        F.count(F.lit(1)).alias("non_positive_prices")
    )
    return dup.crossJoin(nulls).crossJoin(nonpos)


# ---------------------------------------------------------------------------
# Rollup — hierarchical totals (cheap built-in extension, SURVEY §2.4 note)
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
SELECT
  COALESCE(r.r_name, 'ALL') AS region,
  COALESCE(n.n_name, 'ALL') AS nation,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal,
  COUNT(*) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@query(
    "agg_rollup_region_nation",
    _ROLLUP_SQL,
    doc="ROLLUP hierarchical totals (engine analytics extension over A-aggregates).",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            dsum(dec("c_acctbal", 12, 2), "total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "total_acctbal",
            "n_customers",
        )
    )


# ---------------------------------------------------------------------------
# Tumbling window aggregate (batch twin of streaming/analytics.py)
# ---------------------------------------------------------------------------

_TW_SQL = """
SELECT
  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query(
    "s_tumbling_window_agg",
    _TW_SQL,
    doc="Tumbling event-time window aggregate (batch semantics twin of the streaming path, SURVEY §2.8).",
    bench=True,
)
def s_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dec("value", 18, 2), "total_value"),
        )
    )
