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


# ---------------------------------------------------------------------------
# Time-RANGE window frame — trailing 1h sums per user (the ops-dashboard
# "activity in the last hour" shape, computed set-based not per-query)
# ---------------------------------------------------------------------------

_WRANGE_SQL = """
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS trailing_1h_value,
  CAST(COUNT(*) OVER (
    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)
    AS trailing_1h_events
FROM events
"""


@query(
    "w_range_frame",
    _WRANGE_SQL,
    doc=(
        "RANGE window frame over event time: per-user trailing-1h "
        "decimal sum + count (peers with equal ts share a frame — the "
        "semantics ROWS frames get wrong). Spark expresses the interval "
        "as a rangeBetween over unix_micros; one hash-partitioned "
        "window, no self-join-per-row."
    ),
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir)
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-hour_us, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value", 18, 2)).over(w).cast("double").alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("trailing_1h_events"),
    )


# ---------------------------------------------------------------------------
# Mode (most frequent value) per key — deterministic argmax tiebreak
# ---------------------------------------------------------------------------

_AMODE_SQL = """
SELECT user_id, event_type AS mode_event_type, CAST(c AS BIGINT) AS n_events
FROM (
  SELECT user_id, event_type, c, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY c DESC, event_type ASC) AS rn
  FROM (SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type)
) WHERE rn = 1
"""


@query(
    "a_mode_per_group",
    _AMODE_SQL,
    doc=(
        "Per-user modal event type: two map-side-combinable hash aggs "
        "(count per (user, type), then max_by argmax with a count-then-"
        "value tiebreak) — MODE() without the engine-specific tie "
        "behavior, and without a window over the full count table."
    ),
)
def a_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    # argmax by (c DESC, event_type ASC) == min over (-c, event_type)
    best = counts.groupBy("user_id").agg(
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("event_type").alias("t"))).alias("b")
    )
    return best.select(
        "user_id",
        F.col("b.t").alias("mode_event_type"),
        (-F.col("b.nc")).cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff — change-data-feed emission (the reverse of change-log
# apply: produce the i/u/d set that syncs a downstream copy)
# ---------------------------------------------------------------------------

_XDIFF_CUT_LO = "1970-01-05 00:00:00"
_XDIFF_CUT_HI = "1970-01-08 00:00:00"

_XDIFF_SQL = f"""
WITH old AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{_XDIFF_CUT_HI}'
  GROUP BY user_id
),
new AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{_XDIFF_CUT_LO}'
  GROUP BY user_id
)
SELECT COALESCE(n.user_id, o.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            WHEN o.n_events IS DISTINCT FROM n.n_events
              OR o.total_value IS DISTINCT FROM n.total_value THEN 'update'
       END AS op
FROM old o FULL JOIN new n ON o.user_id = n.user_id
WHERE (o.user_id IS NULL OR n.user_id IS NULL
       OR o.n_events IS DISTINCT FROM n.n_events
       OR o.total_value IS DISTINCT FROM n.total_value)
"""


@query(
    "x_snapshot_diff",
    _XDIFF_SQL,
    doc=(
        "Change-data-feed emission: diff two versions of a per-user "
        "aggregate table (overlapping time windows, so inserts, updates "
        "AND deletes all occur) into the i/u/d set that syncs a "
        "downstream copy — operators/incremental.py:snapshot_diff, one "
        "full outer hash join on the key, null-safe comparisons, "
        "unchanged rows dropped before anything moves."
    ),
)
def x_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import snapshot_diff

    ev = events_table(spark, sf_dir)

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(dec("value", 18, 2)).cast("double").alias("total_value"),
        )

    old = agg(ev.filter(F.col("ts") < F.lit(_XDIFF_CUT_HI).cast("timestamp")))
    new = agg(ev.filter(F.col("ts") >= F.lit(_XDIFF_CUT_LO).cast("timestamp")))
    return snapshot_diff(old, new, ["user_id"])


# ---------------------------------------------------------------------------
# Robust anomalies — median/MAD variant of the z-score probe (a5's
# robust twin: outliers can't drag the threshold that detects them)
# ---------------------------------------------------------------------------

_AMAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, m.med, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type, m.med
)
SELECT e.event_id, e.user_id, e.event_type, e.value
FROM events e JOIN mad USING (event_type)
WHERE abs(e.value - mad.med) > 8 * mad.mad
"""


@query(
    "a_mad_anomalies",
    _AMAD_SQL,
    doc=(
        "Median/MAD outlier probe — the robust twin of a5's z-score "
        "(mean and stddev are dragged by the very outliers they should "
        "flag; the median and MAD are not). Two grouped exact-percentile "
        "aggs + broadcast of the per-type thresholds back onto the "
        "stream; percentile interpolation is the cross-engine-exact "
        "arithmetic a_percentiles already pins."
    ),
)
def a_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > 8 * F.col("mad"))
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# UNPIVOT — pivot's inverse (wide metrics -> long (metric, value) rows)
# ---------------------------------------------------------------------------

_AUNPIVOT_SQL = """
WITH wide AS (
  SELECT o_orderstatus AS status,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                       THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
           AS urgent_revenue,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                       THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
           AS low_revenue,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_orderstatus
)
SELECT status, metric, value FROM (
  SELECT status, 'urgent_revenue' AS metric, urgent_revenue AS value FROM wide
  UNION ALL
  SELECT status, 'low_revenue', low_revenue FROM wide
  UNION ALL
  SELECT status, 'n_orders', CAST(n_orders AS DOUBLE) FROM wide
)
WHERE value IS NOT NULL
"""


@query(
    "agg_unpivot_metrics",
    _AUNPIVOT_SQL,
    doc=(
        "UNPIVOT (pivot's inverse): a wide per-status metrics row melts "
        "to long (status, metric, value) triples via stack() — zero "
        "shuffle beyond the feeding agg; the metric-catalog shape "
        "monitoring sinks want."
    ),
)
def agg_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    urgent = F.when(
        F.col("o_orderpriority") == "1-URGENT", dec("o_totalprice", 12, 2)
    )
    low = F.when(F.col("o_orderpriority") == "5-LOW", dec("o_totalprice", 12, 2))
    wide = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.sum(urgent).cast("double").alias("urgent_revenue"),
        F.sum(low).cast("double").alias("low_revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    return (
        wide.select(
            "status",
            F.expr(
                "stack(3, 'urgent_revenue', urgent_revenue, "
                "'low_revenue', low_revenue, "
                "'n_orders', CAST(n_orders AS DOUBLE)) AS (metric, value)"
            ),
        )
        .filter(F.col("value").isNotNull())
    )


# ---------------------------------------------------------------------------
# Value histogram — fixed-width integer binning (the data-profiling agg;
# no percentile state, one map-side-combinable pass)
# ---------------------------------------------------------------------------

_HIST_BINS = 20
_HIST_LO = 0.0
_HIST_HI = 1000.0

_AHIST_SQL = f"""
SELECT event_type,
       CAST(LEAST(GREATEST(FLOOR((value - {_HIST_LO})
              * {_HIST_BINS} / ({_HIST_HI} - {_HIST_LO})), 0),
            {_HIST_BINS - 1}) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
"""


@query(
    "a_value_histogram",
    _AHIST_SQL,
    doc=(
        f"Fixed-width histogram per event type ({_HIST_BINS} bins over "
        f"[{_HIST_LO}, {_HIST_HI}), edges clamped): pure integer bin "
        "arithmetic, ONE hash agg with map-side partials — the "
        "profiling pass that, unlike percentile sketches, costs nothing "
        "extra at 100 TB and merges across partitions exactly."
    ),
)
def a_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    span = _HIST_HI - _HIST_LO
    bin_ = F.least(
        F.greatest(
            F.floor((F.col("value") - _HIST_LO) * _HIST_BINS / span), F.lit(0)
        ),
        F.lit(_HIST_BINS - 1),
    )
    return ev.groupBy(
        "event_type", bin_.cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


# ---------------------------------------------------------------------------
# Table profile — per-column null/distinct/extrema summary (tall form)
# ---------------------------------------------------------------------------

_TPROF_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM customer)
SELECT col, n_nulls, n_distinct, min_str, max_str FROM (
  SELECT 'c_custkey' AS col,
         CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
         CAST(MIN(c_custkey) AS VARCHAR) AS min_str,
         CAST(MAX(c_custkey) AS VARCHAR) AS max_str
  FROM customer
  UNION ALL
  SELECT 'c_name',
         CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT),
         CAST(COUNT(DISTINCT c_name) AS BIGINT),
         MIN(c_name), MAX(c_name)
  FROM customer
  UNION ALL
  SELECT 'c_mktsegment',
         CAST(COUNT(*) FILTER (c_mktsegment IS NULL) AS BIGINT),
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
         MIN(c_mktsegment), MAX(c_mktsegment)
  FROM customer
  UNION ALL
  SELECT 'c_nationkey',
         CAST(COUNT(*) FILTER (c_nationkey IS NULL) AS BIGINT),
         CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
         CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
  FROM customer
)
"""


@query(
    "t_profile_table",
    _TPROF_SQL,
    doc=(
        "Per-column profile (nulls / distincts / extrema as strings, "
        "tall output) — the T-series data-quality surface generalized "
        "to a whole-table profiling pass. Spark computes ALL columns in "
        "ONE aggregate over the table (count_distinct + min/max are "
        "map-side partial), then melts; the scan happens once, not "
        "once per column."
    ),
)
def t_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_mktsegment", "c_nationkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).cast("bigint").alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    wide = cust.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) "
            "AS (col, n_nulls, n_distinct, min_str, max_str)"
        )
    )


# ---------------------------------------------------------------------------
# Gaps & islands — consecutive-day activity streaks per user (the classic
# sessionization-in-SQL shape over calendar days)
# ---------------------------------------------------------------------------

_WSTREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS d
  FROM events
),
islands AS (
  SELECT user_id, d,
         d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, COUNT(*) AS len FROM islands GROUP BY user_id, grp
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM streaks GROUP BY user_id
"""


@query(
    "w_gap_islands",
    _WSTREAK_SQL,
    doc=(
        "Gaps-and-islands: consecutive-day activity streaks per user "
        "via the day-minus-row_number constant-group trick — distinct "
        "days, one ranked window, two grouped aggs; integer epoch-day "
        "arithmetic end to end. The calendar-streak twin of the "
        "timestamp-gap sessionize operator."
    ),
)
def w_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir)
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    days = ev.select("user_id", day.alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("len").cast("bigint").alias("n_active_days"),
    )


# ---------------------------------------------------------------------------
# Event-transition matrix — first-order Markov bigrams over each user's
# event stream (sequence analytics: what follows what, and how often)
# ---------------------------------------------------------------------------

_ATRANS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id
           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS curr_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, curr_type, CAST(n AS BIGINT) AS n_transitions,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE)
         AS p_transition
FROM pairs
"""


@query(
    "a_event_transitions",
    _ATRANS_SQL,
    doc=(
        "First-order Markov transition matrix over per-user event "
        "streams: one lag window with a (ts, event_id) total order, one "
        "hash agg on the bigram, row-normalized to probabilities. The "
        "probability division is exact-int -> double on both engines, so "
        "it hashes. Sequence analytics without self-joins."
    ),
)
def a_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("curr_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "curr_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "curr_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        (
            F.col("n").cast("double") / F.sum("n").over(wrow).cast("double")
        ).alias("p_transition"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average value — each reading holds until the next one,
# so it is weighted by the seconds it was in force (the banking
# "average daily balance" shape, computed from irregular event times)
# ---------------------------------------------------------------------------

_ATWA_SQL = """
WITH seq AS (
  SELECT user_id, value,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
         LEAD(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)) OVER (
           PARTITION BY user_id
           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_us
  FROM events
),
weighted AS (
  SELECT user_id,
         (next_us - us) // 1000000 AS dt_s,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM seq WHERE next_us IS NOT NULL
)
SELECT user_id,
       CAST(SUM(v * CAST(dt_s AS DECIMAL(10,0))) AS DOUBLE)
         / CAST(SUM(dt_s) AS DOUBLE) AS twa_value,
       CAST(SUM(dt_s) AS BIGINT) AS observed_seconds
FROM weighted
GROUP BY user_id
HAVING SUM(dt_s) > 0
"""


@query(
    "a_time_weighted_balance",
    _ATWA_SQL,
    doc=(
        "Time-weighted average value per user: lead() pairs each event "
        "with its successor, the gap (integer seconds) is the weight, "
        "and the weighted sum routes through DECIMAL so both engines "
        "produce the identical exact numerator before ONE double "
        "division at the end. Per-user magnitudes are sf-invariant "
        "(scale adds users, not per-user history), so the decimal->double "
        "cast stays far inside 2^53."
    ),
)
def a_time_weighted_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "user_id",
        dec("value", 18, 2).alias("v"),
        (F.lead(us).over(w) - us).alias("_gap_us"),
    ).filter(F.col("_gap_us").isNotNull())
    # integer seconds — `div`, not `/` (double division drifts at scale)
    weighted = seq.withColumn("dt_s", F.expr("_gap_us div 1000000"))
    return (
        weighted.groupBy("user_id")
        .agg(
            F.sum(F.col("v") * F.col("dt_s").cast("decimal(10,0)")).alias("_num"),
            F.sum("dt_s").cast("bigint").alias("observed_seconds"),
        )
        .filter(F.col("observed_seconds") > 0)
        .select(
            "user_id",
            (
                F.col("_num").cast("double")
                / F.col("observed_seconds").cast("double")
            ).alias("twa_value"),
            "observed_seconds",
        )
    )


# ---------------------------------------------------------------------------
# RFM segmentation — recency/frequency/monetary quartiles per customer
# (the classic CRM scoring), fully tiebroken so NTILE is deterministic
# ---------------------------------------------------------------------------

_ARFM_SQL = """
WITH base AS (
  SELECT o_custkey AS custkey,
         MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS last_day,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT custkey, n_orders, monetary,
       CAST(NTILE(4) OVER (ORDER BY last_day ASC,  custkey) AS BIGINT) AS r_score,
       CAST(NTILE(4) OVER (ORDER BY n_orders ASC, custkey) AS BIGINT) AS f_score,
       CAST(NTILE(4) OVER (ORDER BY monetary ASC, custkey) AS BIGINT) AS m_score
FROM base
"""


@query(
    "a_rfm_segments",
    _ARFM_SQL,
    doc=(
        "RFM customer segmentation: one hash agg builds "
        "recency/frequency/monetary per customer, then three NTILE(4) "
        "windows assign quartile scores (1 = least recent / fewest / "
        "lowest spend, 4 = best). Every NTILE ordering carries the "
        "custkey tiebreak, so bucket boundaries are a total order and "
        "both engines cut them identically. The single-partition windows "
        "run on the post-agg table (|customers|), not the fact table."
    ),
)
def a_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
        ).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("monetary"),
    )
    return base.select(
        "custkey",
        "n_orders",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("last_day", "custkey"))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy("n_orders", "custkey"))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy("monetary", "custkey"))
        .cast("bigint")
        .alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Rolling window median — robust smoothing over each user's last five
# readings (median has no distributive form, so the frame is collected,
# sorted, and indexed — bounded at 5 elements, never a full partition)
# ---------------------------------------------------------------------------

_WMED_SQL = """
SELECT event_id, user_id,
       MEDIAN(value) OVER (
         PARTITION BY user_id
         ORDER BY CAST(ts AS TIMESTAMP), event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5_value
FROM events
"""


@query(
    "w_rolling_median",
    _WMED_SQL,
    doc=(
        "Rolling 5-row median per user: Spark has no median window "
        "aggregate, so the frame (bounded, 5 rows) is collect_list'd, "
        "array_sort'd and indexed — odd count takes the middle, even "
        "count averages the two middles, matching DuckDB's MEDIAN "
        "interpolation. The frame bound keeps per-row state O(5); this "
        "never materializes a whole partition."
    ),
)
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    return ev.select("event_id", "user_id", frame.alias("_f")).select(
        "event_id",
        "user_id",
        F.expr(
            "CASE WHEN size(_f) % 2 = 1 "
            "THEN element_at(_f, CAST((size(_f)+1) div 2 AS INT)) "
            "ELSE (element_at(_f, CAST(size(_f) div 2 AS INT)) "
            "      + element_at(_f, CAST(size(_f) div 2 + 1 AS INT))) / 2 "
            "END"
        ).alias("med5_value"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen — fraud analytics over transaction amounts
# (digit extraction via exact integer cents, never log10/float formatting)
# ---------------------------------------------------------------------------

_ABENFORD_SQL = """
WITH cents AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders WHERE o_totalprice > 0
),
digits AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM cents
)
SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
FROM digits GROUP BY digit
"""


@query(
    "a_benford",
    _ABENFORD_SQL,
    doc=(
        "Benford first-digit distribution of order amounts (the classic "
        "fraud screen): amounts go through exact DECIMAL cents to a "
        "BIGINT whose string leading digit is engine-independent — no "
        "log10, no float formatting. One map-side-combined agg plus a "
        "9-row share normalization."
    ),
)
def a_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = (dec("o_totalprice", 18, 2) * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("bigint")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "digit",
        F.col("n").cast("bigint").alias("n_orders"),
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy()).cast("double")
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# Pareto revenue concentration — running share of total revenue by
# customer rank (the 80/20 curve); the global sort runs on the POST-AGG
# customer table, never the fact table
# ---------------------------------------------------------------------------

_APARETO_SQL = """
WITH base AS (
  SELECT o_custkey AS custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT custkey,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, custkey) AS BIGINT) AS rev_rank,
       CAST(SUM(rev) OVER (ORDER BY rev DESC, custkey
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / CAST(SUM(rev) OVER () AS DOUBLE) AS cum_share
FROM base
"""


@query(
    "a_pareto_share",
    _APARETO_SQL,
    doc=(
        "Pareto/80-20 concentration curve: exact-decimal revenue per "
        "customer, ranked desc with a custkey tiebreak, running decimal "
        "share of total. The ordered window runs on |customers| rows "
        "after the fact-table agg; cumulative and total sums stay "
        "DECIMAL until ONE double division per row."
    ),
)
def a_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(dec("o_totalprice", 18, 2)).alias("rev")
    )
    word = Window.orderBy(F.col("rev").desc(), "custkey")
    return base.select(
        "custkey",
        F.col("rev").cast("double").alias("revenue"),
        F.row_number().over(word).cast("bigint").alias("rev_rank"),
        (
            F.sum("rev")
            .over(word.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            / F.sum("rev").over(Window.partitionBy()).cast("double")
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Gap-fill with last-observation-carried-forward — the time-series
# resample primitive (daily purchase series per user, LOCF across the
# days with no purchase)
# ---------------------------------------------------------------------------

_WLOCF_SQL = """
WITH p AS (
  SELECT user_id, value,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS d,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
           ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
),
daily AS (SELECT user_id, d, value AS day_value FROM p WHERE rn = 1),
spans AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id),
days AS (
  SELECT user_id, CAST(gs.g AS BIGINT) AS d
  FROM spans, LATERAL (SELECT unnest(generate_series(d0, d1)) AS g) gs
)
SELECT days.user_id, days.d,
       last_value(daily.day_value IGNORE NULLS) OVER (
         PARTITION BY days.user_id ORDER BY days.d
         ROWS UNBOUNDED PRECEDING) AS locf_value,
       (daily.user_id IS NOT NULL) AS observed
FROM days LEFT JOIN daily ON daily.user_id = days.user_id AND daily.d = days.d
"""


@query(
    "w_locf_gapfill",
    _WLOCF_SQL,
    doc=(
        "Time-series resample: each user's sparse purchase history "
        "becomes a dense daily series (sequence-explode of the per-user "
        "span), missing days filled by last-observation-carried-forward "
        "(ignore-nulls last over an ordered window). Per-day latest "
        "purchase picked by a (ts, event_id) total order. The explode "
        "is bounded by the calendar span, not the event count — at "
        "100TB the dense grid is |users| x days, built without ever "
        "sorting the fact table globally."
    ),
)
def w_locf_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir).filter(F.col("event_type") == "purchase")
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    # latest purchase per (user, day): max over the unique (ts, event_id)
    # total order carries its value along — one hash agg, no window
    daily = (
        ev.select("user_id", day.alias("d"), F.struct("ts", "event_id", "value").alias("s"))
        .groupBy("user_id", "d")
        .agg(F.max("s")["value"].alias("day_value"))
    )
    spans = daily.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    days = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("d")
    ).withColumn("d", F.col("d").cast("bigint"))
    joined = days.join(
        daily.withColumn("d", F.col("d").cast("bigint")).withColumn(
            "observed", F.lit(True)
        ),
        ["user_id", "d"],
        "left",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "d",
        F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
        F.coalesce("observed", F.lit(False)).alias("observed"),
    )


# ---------------------------------------------------------------------------
# Distribution ranks — percent_rank / cume_dist / ntile decile surface
# (every ordering carries the event_id tiebreak: total order, so the
# rank ratios are engine-independent integers-over-integers)
# ---------------------------------------------------------------------------

_WDIST_SQL = """
SELECT event_id, event_type,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       CAST(NTILE(10) OVER w AS BIGINT) AS decile
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


@query(
    "w_distribution_ranks",
    _WDIST_SQL,
    doc=(
        "Relative-standing window surface: percent_rank, cume_dist and "
        "decile NTILE per event type over (value, event_id) — exact "
        "rank integers divided once into doubles, identical across "
        "engines because the ordering is total."
    ),
)
def w_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — the general form of rollup/cube, with COALESCE labels
# instead of grouping_id (bit conventions differ across engines; the
# label contract doesn't)
# ---------------------------------------------------------------------------

_AGSETS_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(user_id AS VARCHAR), 'ALL') AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id), (event_type, user_id), ())
"""


@query(
    "agg_grouping_sets",
    _AGSETS_SQL,
    doc=(
        "GROUPING SETS over (type), (user), (type,user) and the grand "
        "total in one pass — the general rollup/cube form. Dimensions "
        "are labeled via COALESCE('ALL') rather than grouping_id, whose "
        "bit order is an engine convention; no real key collides with "
        "the label. Spark expands the sets into one Expand + hash agg."
    ),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(user_id AS STRING), 'ALL') AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (user_id), (event_type, user_id), ())
        """
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct users — 3-day rolling active-user counts (the
# batch twin of the streaming sliding window, exact distincts)
# ---------------------------------------------------------------------------

_ASLIDE_SQL = """
WITH d AS (
  SELECT user_id,
         CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS day
  FROM events
),
w AS (
  SELECT user_id, day + gs.g AS window_day
  FROM d, LATERAL (SELECT unnest(generate_series(0, 2)) AS g) gs
)
SELECT CAST(window_day AS BIGINT) AS window_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users,
       CAST(COUNT(*) AS BIGINT) AS n_window_events
FROM w GROUP BY 1
"""


@query(
    "a_sliding_distinct",
    _ASLIDE_SQL,
    doc=(
        "3-day sliding active users: each event replicates into the 3 "
        "windows that contain its day (bounded explode, factor = window "
        "span), then one grouped exact distinct — the standard sliding-"
        "window trick that turns overlap into group-by, shuffle keyed on "
        "window_day. The streaming twin is the sliding window agg in "
        "streaming/analytics.py."
    ),
)
def a_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    w = ev.select(
        "user_id",
        F.explode(F.sequence(day, day + F.lit(2))).alias("window_day"),
    )
    return w.groupBy(F.col("window_day").cast("bigint").alias("window_day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_window_events"),
    )


# ---------------------------------------------------------------------------
# Top session paths — most frequent event-type sequences per 30-min
# session (funnel discovery: what users actually do, not what the
# funnel definition assumes)
# ---------------------------------------------------------------------------

_ATOPPATH_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
           LAG(CAST(ts AS TIMESTAMP)) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
    FROM events
  )
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""


@query(
    "a_top_paths",
    _ATOPPATH_SQL,
    doc=(
        "Top-20 session paths: the 30-min sessionizer (same lag+cumsum "
        "contract as w_sessionize) feeds a per-session ordered "
        "event-type join ('>' separated, (ts, event_id) total order), "
        "then one path-count agg and a TakeOrdered top-k with a path "
        "tiebreak — funnel discovery with two exchanges beyond the "
        "session window, and no global sort."
    ),
)
def a_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import sessionize

    ev = events_table(spark, sf_dir)
    s = sessionize(ev, ["user_id"], "ts", 30.0, tiebreak_cols=["event_id"])
    paths = s.groupBy("user_id", "session_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(ts, event_id, event_type))), x -> x.event_type), '>')"
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return counts.orderBy(F.col("n_sessions").desc(), F.col("path").asc()).limit(20)
