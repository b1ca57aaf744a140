"""Second-wave operator coverage: remaining SURVEY.md §2 aggregates
(A2 counts, A4 reconciliation), set operations, pivot, JSON field
extraction (the VARIANT-access analog), exact distinct counts, and the
as-of join extension."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from ..sources.parquet_io import read_table
from ._det import dec, events_table
from .registry import query

# ---------------------------------------------------------------------------
# A2 — COUNT(*) sanity surface (readme.md:689)
# ---------------------------------------------------------------------------

_A2_SQL = """
SELECT
  (SELECT COUNT(*) FROM orders) AS n_orders,
  (SELECT COUNT(*) FROM lineitem) AS n_lineitems,
  (SELECT COUNT(*) FROM customer) AS n_customers,
  (SELECT COUNT(*) FROM events) AS n_events
"""


@query(
    "a2_table_counts",
    _A2_SQL,
    doc="A2 COUNT(*) sanity queries across the star schema.",
)
def a2_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    def cnt(name, alias):
        return read_table(spark, sf_dir, name).agg(F.count(F.lit(1)).alias(alias))

    return (
        cnt("orders", "n_orders")
        .crossJoin(cnt("lineitem", "n_lineitems"))
        .crossJoin(cnt("customer", "n_customers"))
        .crossJoin(events_table(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_events")))
    )


# ---------------------------------------------------------------------------
# A4 — aggregate reconciliation (readme.md:251): fact totals vs dim sums
# ---------------------------------------------------------------------------

_A4_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS cust_rev
  FROM orders GROUP BY o_custkey
),
direct AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_direct,
         COUNT(*) AS n_orders
  FROM orders
),
rolled AS (
  SELECT CAST(SUM(cust_rev) AS DOUBLE) AS total_rolled,
         COUNT(*) AS n_custs
  FROM per_cust
)
SELECT total_direct, total_rolled,
       (total_direct = total_rolled) AS reconciled,
       n_orders, n_custs
FROM direct, rolled
"""


@query(
    "a4_reconciliation",
    _A4_SQL,
    doc="A4 aggregate reconciliation: per-key rollup re-aggregated equals the direct total (exact decimal).",
)
def a4_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    price = dec("o_totalprice", 12, 2)
    per_cust = orders.groupBy("o_custkey").agg(F.sum(price).alias("cust_rev"))
    direct = orders.agg(
        F.sum(price).cast("double").alias("total_direct"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    rolled = per_cust.agg(
        F.sum("cust_rev").cast("double").alias("total_rolled"),
        F.count(F.lit(1)).alias("n_custs"),
    )
    return direct.crossJoin(rolled).select(
        "total_direct",
        "total_rolled",
        (F.col("total_direct") == F.col("total_rolled")).alias("reconciled"),
        "n_orders",
        "n_custs",
    )


_A4B_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS cust_rev
  FROM orders GROUP BY o_custkey
),
direct AS (
  SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total_direct,
         COUNT(*) AS n_orders
  FROM orders
),
rolled AS (
  SELECT SUM(cust_rev) AS total_rolled, COUNT(*) AS n_custs
  FROM per_cust
)
SELECT CAST(total_direct AS VARCHAR) AS total_direct,
       CAST(total_rolled AS VARCHAR) AS total_rolled,
       (total_direct = total_rolled) AS reconciled,
       n_orders, n_custs
FROM direct, rolled
"""


@query(
    "a4b_reconciliation_decimal",
    _A4B_SQL,
    doc=(
        "A4 reconciliation in EXACT-DECIMAL mode (SURVEY §1.2): the whole "
        "chain stays DecimalType — no double anywhere — so rollup equals "
        "direct total bit-for-bit by construction. Totals presented as "
        "strings (engines disagree on decimal→pandas dtypes; the digits "
        "are the contract)."
    ),
)
def a4b_reconciliation_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    price = dec("o_totalprice", 12, 2)
    per_cust = orders.groupBy("o_custkey").agg(F.sum(price).alias("cust_rev"))
    direct = orders.agg(
        F.sum(price).alias("total_direct"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    rolled = per_cust.agg(
        F.sum("cust_rev").alias("total_rolled"),
        F.count(F.lit(1)).alias("n_custs"),
    )
    return direct.crossJoin(rolled).select(
        F.col("total_direct").cast("string").alias("total_direct"),
        F.col("total_rolled").cast("string").alias("total_rolled"),
        (F.col("total_direct") == F.col("total_rolled")).alias("reconciled"),
        "n_orders",
        "n_custs",
    )


# ---------------------------------------------------------------------------
# Set operations (INTERSECT / EXCEPT — SURVEY §2.6 gap, built-ins)
# ---------------------------------------------------------------------------

_SETOPS_SQL = """
SELECT 'error_no_purchase' AS cohort, user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT 'error_and_signup' AS cohort, user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
)
"""


@query(
    "set_ops_cohorts",
    _SETOPS_SQL,
    doc="EXCEPT / INTERSECT / UNION ALL cohort analysis (set-op surface).",
)
def set_ops_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)

    def users(t):
        return ev.filter(F.col("event_type") == t).select("user_id").distinct()

    no_purchase = users("error").exceptAll(users("purchase")).distinct()
    and_signup = users("error").intersect(users("signup"))
    return no_purchase.select(
        F.lit("error_no_purchase").alias("cohort"), "user_id"
    ).unionByName(and_signup.select(F.lit("error_and_signup").alias("cohort"), "user_id"))


# ---------------------------------------------------------------------------
# Pivot (wide aggregation; portable oracle via conditional aggregation)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_SQL = f"""
SELECT user_id,
  {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
"""


@query(
    "agg_pivot_event_types",
    _PIVOT_SQL,
    doc="Pivot: per-user event-type count matrix (fixed value list → no extra pass).",
)
def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


# ---------------------------------------------------------------------------
# P1 analog — JSON field extraction (VARIANT access; stg_*.sql `v:field::type`)
# ---------------------------------------------------------------------------

_JSON_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50) AS k_high
FROM events
"""


@query(
    "p1_json_extract",
    _JSON_SQL,
    doc="P1 semi-structured field extraction + cast (the stg `v:field::type` VARIANT pattern).",
)
def p1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id", k.alias("k_value"), (k >= 50).alias("k_high")
    )


# ---------------------------------------------------------------------------
# Exact distinct counts (approx_count_distinct's oracle-able twin)
# ---------------------------------------------------------------------------

_DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


@query(
    "a_distinct_users",
    _DISTINCT_SQL,
    doc="Exact COUNT(DISTINCT) per group (approx_count_distinct exposed engine-side; HLL sketches differ per engine so the oracle checks the exact twin).",
)
def a_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# As-of join (operators/asof.py) vs DuckDB's native ASOF JOIN
# ---------------------------------------------------------------------------

_ASOF_SQL = """
SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
       v.value AS view_value, v.event_id AS view_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
"""


@query(
    "asof_last_view_before_purchase",
    _ASOF_SQL,
    doc="As-of (nearest-earlier) join via union-tag + window carry — single-shuffle composition of an operator Spark lacks; oracle uses DuckDB's native ASOF JOIN.",
    bench=True,
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("value").alias("view_value"),
        F.col("event_id").alias("view_event_id"),
    )
    return asof_join_backward(
        purchases,
        views,
        key_cols=["user_id"],
        ts_col="ts",
        payload_cols=["view_value", "view_event_id"],
        tiebreak_col="view_event_id",
    )


# ---------------------------------------------------------------------------
# Subquery surface: EXISTS / NOT EXISTS / scalar subquery
# ---------------------------------------------------------------------------

_SUBQ_SQL = """
WITH stats AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_price
  FROM orders
)
SELECT c.c_custkey, c.c_name,
       CAST(n_big AS BIGINT) AS n_big_orders
FROM customer c
JOIN (
  SELECT o_custkey, COUNT(*) AS n_big
  FROM orders, stats
  WHERE CAST(o_totalprice AS DOUBLE) > avg_price
  GROUP BY o_custkey
) b ON b.o_custkey = c.c_custkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F')
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


@query(
    "p_subqueries",
    _SUBQ_SQL,
    doc=(
        "Subquery surface: scalar subquery (global avg price), EXISTS "
        "(semi-join), NOT EXISTS (anti-join) — Catalyst rewrites all "
        "three to joins (the scalar one to a broadcast single-row "
        "cross), so none of them re-scans per row."
    ),
)
def p_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    stats = orders.agg(
        (
            F.sum(dec("o_totalprice", 12, 2)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    big = (
        orders.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice").cast("double") > F.col("avg_price"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    has_f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("f_custkey"))
        .distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("u_custkey"))
        .distinct()
    )
    return (
        customer.join(big, customer["c_custkey"] == big["o_custkey"])
        .join(has_f, F.col("c_custkey") == F.col("f_custkey"), "left_semi")
        .join(urgent, F.col("c_custkey") == F.col("u_custkey"), "left_anti")
        .select(
            "c_custkey",
            "c_name",
            F.col("n_big").cast("bigint").alias("n_big_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Interval join (streaming/analytics.interval_join batch twin)
# ---------------------------------------------------------------------------

_IVJ_SQL = """
SELECT l.event_id AS view_id, r.event_id AS purchase_id, l.user_id,
       CAST(l.ts AS TIMESTAMP) AS view_ts, CAST(r.ts AS TIMESTAMP) AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'view') l
JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id
 AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP)
 AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
"""


@query(
    "j6_interval_join",
    _IVJ_SQL,
    doc=(
        "Event-time interval join (view→purchase within 10 min), the "
        "batch twin of streaming/analytics.interval_join — identical "
        "semantics on streams where the bounded time range is what lets "
        "Spark evict join state. Equi-join on the key + range residual "
        "(never a pure range cross-join)."
    ),
)
def j6_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.analytics import interval_join

    ev = events_table(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return interval_join(
        views, purchases, "user_id", "ts", "ts", upper="10 minutes"
    ).select(
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("view_ts"),
        F.col("r.ts").alias("purchase_ts"),
    )


# ---------------------------------------------------------------------------
# Window frame specs: running totals, lag/lead deltas, rank (O2/W surface)
# ---------------------------------------------------------------------------

_RUN_SQL = """
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
  epoch_us(CAST(ts AS TIMESTAMP))
    - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) AS us_since_prev,
  LEAD(event_type) OVER (
    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_event_type,
  CAST(RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS BIGINT)
    AS value_rank
FROM events
"""


@query(
    "w_running_totals",
    _RUN_SQL,
    doc="Window frame specs: cumulative decimal sum, lag time-delta, lead, rank — the SCD2/sessionization building blocks exposed directly.",
)
def w_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wrank = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value", 18, 2)).over(wcum).cast("double").alias("running_value"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "us_since_prev"
        ),
        F.lead("event_type").over(w).alias("next_event_type"),
        F.rank().over(wrank).cast("bigint").alias("value_rank"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (approx_percentile's oracle-able twin)
# ---------------------------------------------------------------------------

_PCT_SQL = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       MIN(value) AS v_min,
       MAX(value) AS v_max
FROM events GROUP BY event_type
"""


@query(
    "a_percentiles",
    _PCT_SQL,
    doc="Exact linear-interpolated percentiles per group (p95-analyst-query ops surface, readme.md:153; approx_percentile is the at-scale variant, sketch differs per engine).",
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


# ---------------------------------------------------------------------------
# Approximate sketches (at-scale variants; engine-specific sketches can't
# hash-match a DuckDB oracle, so this is a rows-only check by design)
# ---------------------------------------------------------------------------

@query(
    "a_approx_sketches",
    None,  # rows-only: HLL/KLL sketch internals differ per engine
    doc=(
        "approx_count_distinct (HLL) + approx_percentile (KLL-ish) per "
        "event_type — the 100TB forms of a_distinct_users/a_percentiles "
        "(exact twins carry the oracle check)."
    ),
)
def a_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    # Scalar columns only: the driver canonicalizer sorts every column with
    # pandas, which cannot hash list cells (array<double> broke round 1).
    pcts = F.percentile_approx("value", F.lit([0.5, 0.9, 0.99]), F.lit(10000))
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.element_at(pcts, 1).alias("approx_p50"),
        F.element_at(pcts, 2).alias("approx_p90"),
        F.element_at(pcts, 3).alias("approx_p99"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# CUBE — all grouping-set combinations (rollup's sibling, SURVEY §2.4 note)
# ---------------------------------------------------------------------------

_CUBE_SQL = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query(
    "agg_cube_status_priority",
    _CUBE_SQL,
    doc="CUBE over (status, priority): all 2^2 grouping sets in one pass.",
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(dec("o_totalprice", 12, 2)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "revenue",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# O1b — ops query: top spenders within the trailing 24h (readme.md:388-394
# shape: DATEADD(hour,-24) filter + ORDER BY ... LIMIT)
# ---------------------------------------------------------------------------

_O1B_SQL = """
SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
FROM events
WHERE CAST(ts AS TIMESTAMP) >=
      (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 24 HOUR
ORDER BY value DESC, event_id ASC
LIMIT 10
"""


@query(
    "o1b_trailing_window_top",
    _O1B_SQL,
    doc="O1 ops query: trailing-24h window (DATEADD analog) + top-K — high-water-mark-relative filter, TakeOrdered.",
)
def o1b_trailing_window_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    hwm = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(hwm))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 24 HOURS"))
        .select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(10)
    )
