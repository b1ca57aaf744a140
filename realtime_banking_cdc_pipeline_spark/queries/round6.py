"""Round-6 planner-stress shapes: the remaining canonical TPC-H join
patterns over the reference's Gold-mart star schema (reference analogs:
`models/gold/fact_transactions.sql`, `models/gold/dim_customers.sql` —
the reference computes these marts in Snowflake SQL; here each is a
declarative DataFrame plan Catalyst decorrelates/reorders).

- q02 — correlated min-cost subquery (decorrelates to an aggregate +
  re-join on the part key; the classic "cheapest supplier" pattern).
- q07 — volume shipping between two nations (two nation-dim fans on
  one fact row, OR-of-pairs predicate, per-year rollup).
- q08 — market share (conditional share-of-total inside one ratio:
  two exact decimal sums, single double division).
- q09 — product profit (pattern-filtered part fan + supplier nation
  rollup by order year; profit mixes two measure columns).

Determinism follows queries/_det.py: exact decimal money sums, the
same IEEE op order for any double expression on both engines, unique
ORDER BY tiebreaks before every LIMIT.

The testdata schema has no `partsupp` table, so q02/q09's supply-cost
terms derive deterministically from what exists: q02's offer cost is
the supplier's minimum observed unit price (l_extendedprice /
l_quantity — one double division, identical in both engines), q09's
cost term is 10% of the part's retail price per unit, in exact
decimals. The join/decorrelation shapes — what these queries exist to
pin — are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet_io import read_table
from ._det import dec, dsum_r2, sql_dec, sql_dsum_r2
from .registry import query

# ---------------------------------------------------------------------------
# q02 — min-cost supplier (TPC-H Q2 shape): correlated scalar-min
# subquery over a derived offers table
# ---------------------------------------------------------------------------

_Q02_REGION = "EUROPE"

_Q02_SQL = f"""
WITH offers AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{_Q02_REGION}'
)
SELECT p.p_partkey, p.p_name, e.s_name, e.n_name, e.s_acctbal, o.cost
FROM part p
JOIN offers o ON o.l_partkey = p.p_partkey
JOIN eu e ON e.s_suppkey = o.l_suppkey
WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
  AND o.cost = (
    SELECT MIN(o2.cost)
    FROM offers o2 JOIN eu e2 ON e2.s_suppkey = o2.l_suppkey
    WHERE o2.l_partkey = p.p_partkey
  )
ORDER BY e.s_acctbal DESC, e.n_name ASC, e.s_name ASC, p.p_partkey ASC
LIMIT 100
"""


@query(
    "q02_min_cost_supplier",
    _Q02_SQL,
    doc=(
        "TPC-H Q2 shape: correlated scalar-min subquery, hand-"
        "decorrelated the way Catalyst would — the per-part regional "
        "minimum is ONE aggregate over the shared offers⋈region "
        "subtree, re-joined on (partkey, cost). region/nation "
        "broadcast (bounded by construction: 5/25 rows at any scale); "
        "supplier and the offers aggregate shuffle on their natural "
        "keys; TakeOrdered top-100, no global sort. Offer cost is one "
        "double division with identical IEEE op order in both engines, "
        "so the min-equality re-join matches bit-for-bit."
    ),
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist

    li = read_table(spark, sf_dir, "lineitem")
    offers = li.groupBy(
        F.col("l_partkey"), F.col("l_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q02_REGION
    )
    eu = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # shared subtree: regional offers feed both the min-agg and the
    # final row set — persist so it computes once
    eu_offers = track_persist(
        offers.join(eu, offers.l_suppkey == eu.s_suppkey).select(
            "l_partkey", "cost", "s_name", "s_acctbal", "n_name"
        )
    )
    min_cost = eu_offers.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    return (
        eu_offers.join(
            min_cost,
            (eu_offers.l_partkey == min_cost.l_partkey)
            & (eu_offers.cost == min_cost.min_cost),
        )
        .drop(min_cost.l_partkey)
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal", "cost")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q07 — volume shipping (TPC-H Q7 shape): two nation fans on one fact
# ---------------------------------------------------------------------------

_Q07_N1, _Q07_N2 = "NATION_1", "NATION_2"

_Q07_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dsum_r2(f"{sql_dec('volume', 12, 2)} * (CAST(1 AS DECIMAL(4,2)) - {sql_dec('disc', 4, 2)})", "revenue")},
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice AS volume, l.l_discount AS disc
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = '{_Q07_N1}' AND n2.n_name = '{_Q07_N2}')
      OR (n1.n_name = '{_Q07_N2}' AND n2.n_name = '{_Q07_N1}'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
"""


@query(
    "q07_volume_shipping",
    _Q07_SQL,
    doc=(
        "TPC-H Q7 shape: the same fact row fans to TWO nation dims "
        "(supplier's and customer's) with an OR-of-pairs predicate — "
        "the join-reorder stress where filtering both broadcast dims "
        "FIRST shrinks the orders⋈lineitem shuffle to the two nations' "
        "rows. Shipdate range pushes to the scan; exact decimal "
        "revenue; year() evaluates identically in both engines."
    ),
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(_Q07_N1, _Q07_N2)
    )
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nk") == F.col("s_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust = read_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"),
                                  F.col("n_name").alias("cust_nation"))),
        F.col("c_nk") == F.col("c_nationkey"),
    ).select("c_custkey", "cust_nation")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    one = F.lit(1).cast("decimal(4,2)")
    rev = dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 4, 2))
    return (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            ((F.col("supp_nation") == _Q07_N1) & (F.col("cust_nation") == _Q07_N2))
            | ((F.col("supp_nation") == _Q07_N2) & (F.col("cust_nation") == _Q07_N1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dsum_r2(rev, "revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q08 — market share (TPC-H Q8 shape): conditional share-of-total
# ---------------------------------------------------------------------------

_Q08_NATION = "NATION_5"
_Q08_REGION = "ASIA"
_Q08_TYPE = "PROMO"

_Q08_SQL = f"""
SELECT o_year,
       CAST(ROUND(SUM(CASE WHEN supp_nation = '{_Q08_NATION}' THEN vol ELSE CAST(0 AS DECIMAL(16,4)) END), 2) AS DOUBLE)
         / CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS mkt_share,
       {sql_dsum_r2("vol", "total_revenue")},
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST({sql_dec('l.l_extendedprice', 12, 2)} * (CAST(1 AS DECIMAL(4,2)) - {sql_dec('l.l_discount', 4, 2)}) AS DECIMAL(16,4)) AS vol,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  WHERE r.r_name = '{_Q08_REGION}' AND p.p_type = '{_Q08_TYPE}'
)
GROUP BY o_year
"""


@query(
    "q08_market_share",
    _Q08_SQL,
    doc=(
        "TPC-H Q8 shape: one nation's share of a region's PROMO revenue "
        "per order year — a conditional sum over the same rows as the "
        "total, so ONE aggregation computes both (no self-join, no "
        "second pass). Both sums are exact decimals rounded to scale 2; "
        "the share is a single double division, bit-identical across "
        "engines. nation/region broadcast; part/supplier/customer fans "
        "shuffle on natural keys."
    ),
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == _Q08_TYPE)
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q08_REGION
    )
    # customer-side region restriction (broadcast dim fan)
    nc = nation.join(
        F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey")
    ).select(F.col("n_nationkey").alias("cnk"))
    ns = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    one = F.lit(1).cast("decimal(4,2)")
    vol = (
        dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 4, 2))
    ).cast("decimal(16,4)")
    zero = F.lit(0).cast("decimal(16,4)")
    rows = (
        li.join(p.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .join(s.select("s_suppkey", "s_nationkey"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("cnk") == F.col("c_nationkey"))
        .join(F.broadcast(ns), F.col("snk") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    nat_sum = F.round(
        F.sum(F.when(F.col("supp_nation") == _Q08_NATION, F.col("vol")).otherwise(zero)),
        2,
    ).cast("double")
    tot_sum = F.round(F.sum(F.col("vol")), 2).cast("double")
    return rows.groupBy("o_year").agg(
        (nat_sum / tot_sum).alias("mkt_share"),
        dsum_r2(F.col("vol"), "total_revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q09 — product profit (TPC-H Q9 shape): pattern-filtered part fan,
# supplier-nation × order-year rollup
# ---------------------------------------------------------------------------

_Q09_PATTERN = "%bolt%"

_Q09_SQL = f"""
SELECT n_name, o_year,
       {sql_dsum_r2("amount", "profit")},
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM (
  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         {sql_dec('l.l_extendedprice', 12, 2)} * (CAST(1 AS DECIMAL(4,2)) - {sql_dec('l.l_discount', 4, 2)})
           - CAST(0.10 AS DECIMAL(4,2)) * {sql_dec('p.p_retailprice', 12, 2)} * {sql_dec('l.l_quantity', 12, 2)}
           AS amount
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '{_Q09_PATTERN}'
)
GROUP BY n_name, o_year
"""


@query(
    "q09_product_profit",
    _Q09_SQL,
    doc=(
        "TPC-H Q9 shape: profit per supplier nation per order year for "
        "pattern-matched parts. The LIKE filter prunes part BEFORE the "
        "fact join (predicate pushdown on the dim); profit mixes two "
        "measure columns in one exact-decimal expression (supply cost = "
        "10%% of retail per unit — the schema has no partsupp); nation "
        "broadcasts; the rollup is one hash agg on (nation, year)."
    ),
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(_Q09_PATTERN)
    ).select("p_partkey", "p_retailprice")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    one = F.lit(1).cast("decimal(4,2)")
    cost_rate = F.lit(0.10).cast("decimal(4,2)")
    amount = dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 4, 2)) - (
        cost_rate * dec("p_retailprice", 12, 2) * dec("l_quantity", 12, 2)
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            dsum_r2(amount, "profit"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (TPC-H Q13 shape): left outer
# join with a join-side predicate, then a distribution over group sizes
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@query(
    "q13_customer_distribution",
    _Q13_SQL,
    doc=(
        "TPC-H Q13 shape: LEFT OUTER join with the predicate on the "
        "JOIN side (not a WHERE — customers with only urgent orders "
        "must survive with count 0), then a second aggregation over "
        "the group sizes. Two hash aggs, one outer shuffle join on the "
        "customer key; all-integer outputs."
    ),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


# ---------------------------------------------------------------------------
# q15 — top supplier by period revenue (TPC-H Q15 shape): aggregate
# reused as both the ranking input and the scalar-max subquery
# ---------------------------------------------------------------------------

_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM({sql_dec('l_extendedprice', 12, 2)} * (CAST(1 AS DECIMAL(4,2)) - {sql_dec('l_discount', 4, 2)})), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s.s_suppkey
"""


@query(
    "q15_top_supplier",
    _Q15_SQL,
    doc=(
        "TPC-H Q15 shape: a period-revenue aggregate consumed TWICE — "
        "as the join input and as the scalar-max subquery — so the "
        "frame is persisted and computes once (the view-reuse pattern "
        "Q15 exists to test). The max comparison happens on the EXACT "
        "decimal (cast to double only for output), so ties and "
        "equality are engine-independent; shipdate range pushes to "
        "the scan."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist

    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    one = F.lit(1).cast("decimal(4,2)")
    rev = dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 4, 2))
    revenue = track_persist(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            F.round(F.sum(rev), 2).alias("total_rev")
        )
    )
    max_rev = revenue.agg(F.max("total_rev").alias("mx"))
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev") == F.col("mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity revenue (TPC-H Q17 shape): correlated average
# subquery, decorrelated to a per-part aggregate + exact-integer compare
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#1"

_Q17_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT {sql_dsum_r2(sql_dec('l.l_extendedprice', 12, 2), "yearly_total")},
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN per_part a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = '{_Q17_BRAND}'
  AND 5 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.sum_q
"""


@query(
    "q17_small_quantity_revenue",
    _Q17_SQL,
    doc=(
        "TPC-H Q17 shape: 'lines below 20% of the part's average "
        "quantity' — the correlated AVG decorrelates to ONE per-part "
        "aggregate re-joined on the part key, and the fractional "
        "threshold qty < 0.2·(sum/cnt) is rewritten as the exact "
        "integer comparison 5·qty·cnt < sum (quantities are integral), "
        "so no engine ever divides. Brand filter pushes to the part "
        "scan and shrinks the fact join."
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_q"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == _Q17_BRAND
    ).select("p_partkey")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("pp_key") == F.col("l_partkey"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("cnt")
            < F.col("sum_q")
        )
        .agg(
            dsum_r2(dec("l_extendedprice", 12, 2), "yearly_total"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive multi-table predicates (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

_Q19_SQL = f"""
SELECT {sql_dsum_r2(f"{sql_dec('l.l_extendedprice', 12, 2)} * (CAST(1 AS DECIMAL(4,2)) - {sql_dec('l.l_discount', 4, 2)})", "revenue")},
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


@query(
    "q19_disjunctive_predicates",
    _Q19_SQL,
    doc=(
        "TPC-H Q19 shape: an OR of per-branch conjunctions spanning "
        "BOTH join sides. The per-side implied filters (brand IN "
        "(...), quantity <= 30) are derivable and Catalyst pushes the "
        "part-side disjunction into the dim scan; the cross-side "
        "residual evaluates post-join. One fact shuffle, exact "
        "decimal revenue."
    ),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    one = F.lit(1).cast("decimal(4,2)")
    rev = dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 4, 2))
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(
            dsum_r2(rev, "revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q20 — nested semi-joins (TPC-H Q20 shape)
# ---------------------------------------------------------------------------

_Q20_NATION = "NATION_3"
_Q20_MIN_QTY = 50

_Q20_SQL = f"""
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = '{_Q20_NATION}'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS BIGINT)) > {_Q20_MIN_QTY}
  )
ORDER BY s.s_suppkey
"""


@query(
    "q20_heavy_shippers",
    _Q20_SQL,
    doc=(
        "TPC-H Q20 shape: nested semi-join — suppliers (in one "
        "nation) that moved > threshold units of any pattern-matched "
        "part in a year. The inner block is dim-filter → fact join → "
        "grouped HAVING, then LEFT SEMI into supplier; lineitem "
        "columns never reach the outer row set. Integer quantity "
        "sums; shipdate range pushed to the scan."
    ),
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    heavy = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("tot_q"))
        .filter(F.col("tot_q") > _Q20_MIN_QTY)
        .select("l_suppkey")
    )
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q20_NATION
    )
    s = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
    )
    return (
        s.join(heavy, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q22 — global-average filter + anti-join (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

_Q22_CUTOFF = "2001-01-01 00:00:00"

_Q22_SQL = f"""
WITH thresh AS (
  SELECT CAST(SUM({sql_dec('c_acctbal', 12, 2)}) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > CAST(0 AS DOUBLE)
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {sql_dsum_r2(sql_dec('c.c_acctbal', 12, 2), "total_acctbal")}
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
CROSS JOIN thresh
WHERE c.c_acctbal > thresh.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
  )
GROUP BY n.n_name
"""


@query(
    "q22_dormant_rich_customers",
    _Q22_SQL,
    doc=(
        "TPC-H Q22 shape: a global scalar (average positive balance — "
        "exact decimal sum, ONE double division) broadcast-filters "
        "customers, then an ANTI join against recent orders finds the "
        "dormant ones, rolled up per nation. The anti join shuffles on "
        "the customer key with the date filter pushed to the orders "
        "scan; the scalar rides a 1-row broadcast, never a shuffle."
    ),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(dec("c_acctbal", 12, 2)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    recent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dsum_r2(dec("c_acctbal", 12, 2), "total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# x_ngram_novelty — training-data curation: how much of a document's
# n-gram mass is unique to it corpus-wide (boilerplate/template text
# scores near 0, fresh text near 1)
# ---------------------------------------------------------------------------

_XNOV_K = 3


def _xnov_sql() -> str:
    from .llmdata import _DD_TOKS, _dd_shingles

    return f"""
WITH toks AS (SELECT doc_id, {_DD_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_dd_shingles(_XNOV_K)}) AS shingle FROM toks),
df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY shingle),
per_doc AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(COUNT(*) FILTER (WHERE d.df = 1) AS BIGINT) AS n_unique
  FROM sh s JOIN df d USING (shingle)
  GROUP BY s.doc_id
)
SELECT doc_id, n_shingles, n_unique,
       CAST(n_unique AS DOUBLE) / n_shingles AS novelty
FROM per_doc
"""


@query(
    "x_ngram_novelty",
    _xnov_sql(),
    doc=(
        "Per-document n-gram novelty: the fraction of a doc's distinct "
        "3-gram shingles appearing in NO other document (df = 1 over "
        "the corpus-wide inverted index). Boilerplate and template "
        "text score near 0 — the curation signal that catches near-"
        "duplicate MASS the pairwise ops price per-pair. Two hash "
        "aggregations + one shuffle join on the shingle key (unbounded "
        "vocabulary — never broadcast); one double division at the "
        "end. The shingle explode is the same fan-out every sketch op "
        "shares, so at 100 TB this rides the already-materialized "
        "shingle table."
    ),
)
def x_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import exploded_shingles

    d = read_table(spark, sf_dir, "documents")
    sh = exploded_shingles(d, "doc_id", "text", _XNOV_K)
    df_ = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    per_doc = (
        sh.join(df_, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count(F.when(F.col("df") == 1, F.lit(1))).cast("bigint").alias("n_unique"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_unique",
        (F.col("n_unique").cast("double") / F.col("n_shingles")).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# q11 — revenue concentration (TPC-H Q11 shape): grouped aggregate
# kept only where it exceeds a fraction of the GLOBAL total
# ---------------------------------------------------------------------------

_Q11_FRACTION_DEN = 2000  # keep parts with > 1/2000 of total revenue


def _q11_sql() -> str:
    rev = f"{sql_dec('l_extendedprice', 12, 2)} * (CAST(1 AS DECIMAL(4,2)) - {sql_dec('l_discount', 4, 2)})"
    return f"""
WITH pr AS (
  SELECT l_partkey, ROUND(SUM({rev}), 2) AS rev
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(rev) AS total FROM pr)
SELECT pr.l_partkey, CAST(pr.rev AS DOUBLE) AS part_revenue
FROM pr, tot
WHERE pr.rev * {_Q11_FRACTION_DEN} > tot.total
"""


@query(
    "q11_revenue_concentration",
    _q11_sql(),
    doc=(
        "TPC-H Q11 shape: per-part revenue kept only where it beats a "
        "fraction of the GLOBAL total — the grouped-aggregate-vs-"
        "scalar-subquery pattern. The per-part aggregate is persisted "
        "and consumed twice (rows + global sum); the scalar rides a "
        "1-row broadcast; the fraction test is exact decimal×integer, "
        "no division anywhere."
    ),
)
def q11_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist

    li = read_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(4,2)")
    rev = dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 4, 2))
    pr = track_persist(
        li.groupBy("l_partkey").agg(F.round(F.sum(rev), 2).alias("rev"))
    )
    tot = pr.agg(F.sum("rev").alias("total"))
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(F.col("rev") * _Q11_FRACTION_DEN > F.col("total"))
        .select("l_partkey", F.col("rev").cast("double").alias("part_revenue"))
    )


# ---------------------------------------------------------------------------
# q12 — late shipments by priority class (TPC-H Q12 shape):
# fact-fact join + conditional counts
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY ship_year
"""


@query(
    "q12_late_shipments",
    _Q12_SQL,
    doc=(
        "TPC-H Q12 shape: orders⋈lineitem on the natural key with a "
        "cross-table lateness predicate (shipdate > orderdate + 90d, "
        "evaluated inside the join), split into high/low-priority "
        "conditional counts per ship year — one shuffle, one hash agg, "
        "all-integer outputs."
    ),
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q16 — supplier variety (TPC-H Q16 shape): NOT-IN anti-join +
# COUNT(DISTINCT) per attribute combination
# ---------------------------------------------------------------------------

_Q16_SIZES = (1, 5, 9, 13)

_Q16_SQL = f"""
SELECT p.p_brand, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_size IN {_Q16_SIZES}
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < CAST(0 AS DOUBLE)
  )
GROUP BY p.p_brand, p.p_size
"""


@query(
    "q16_supplier_variety",
    _Q16_SQL,
    doc=(
        "TPC-H Q16 shape: how many DISTINCT suppliers serve each "
        "(brand, size) combo, excluding a blacklist — NOT IN becomes "
        "an ANTI join (keys are non-null by construction, so no "
        "null-semantics trap), the dim filters push to the part scan, "
        "and COUNT(DISTINCT) expands to a two-level aggregate that "
        "partial-aggregates map-side."
    ),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(*_Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_size")
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(bad, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# x_tfidf_topk_terms — keyword extraction: each document's top-3
# unigram tf-idf terms (integer fixed-point weights, exact tiebreaks)
# ---------------------------------------------------------------------------

_XKEY_TOPK = 3


def _xkey_sql() -> str:
    from .llmdata import _DD_TOKS

    w_expr = "t.tf * ((1048576 * nn.n) // d.df)"
    return f"""
WITH toks AS (
  SELECT doc_id, list_transform({_DD_TOKS}, x -> lower(x)) AS t FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
SELECT doc_id, term, w, CAST(rk AS BIGINT) AS rk FROM (
  SELECT t.doc_id, t.term, CAST({w_expr} AS BIGINT) AS w,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id
                            ORDER BY {w_expr} DESC, t.term ASC) AS rk
  FROM tf t JOIN df d USING (term), nn
) WHERE rk <= {_XKEY_TOPK}
"""


@query(
    "x_tfidf_topk_terms",
    _xkey_sql(),
    doc=(
        "Per-document keyword extraction: top-3 unigram tf-idf terms "
        "with integer fixed-point idf (2^20·n div df — no libm log) "
        "and (weight DESC, term ASC) deterministic tiebreaks. The "
        "per-doc rank prunes to WindowGroupLimit (top-k per partition "
        "key, never a global sort); the tf⋈df join shuffles on the "
        "term key with no broadcast hint — vocabulary is unbounded."
    ),
)
def x_tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import ws_tokens

    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.transform(ws_tokens("text"), F.lower)).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    weighted = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "term",
            F.expr("CAST(tf * ((1048576 * n) div df) AS BIGINT)").alias("w"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("w").desc(), F.col("term").asc()
    )
    return (
        weighted.withColumn("rk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rk") <= _XKEY_TOPK)
        .select("doc_id", "term", "w", "rk")
    )


# ---------------------------------------------------------------------------
# x_quality_stratified_trim — per-domain quality floor: drop each
# source's bottom quartile (domain-relative, unlike a global cut —
# a clean domain never starves a noisy one)
# ---------------------------------------------------------------------------


def _xstrat_sql() -> str:
    from .llmdata import _DD_NSTOP, _DD_NTOK

    qual = (
        f"CAST((1048576 * {_DD_NSTOP}) // (2 * {_DD_NTOK})"
        " + (1048576 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))"
        "   // (2 * length(text)) AS BIGINT)"
    )
    return f"""
WITH q AS (SELECT doc_id, source, {qual} AS qual_fp FROM documents)
SELECT doc_id, source, qual_fp FROM (
  SELECT doc_id, source, qual_fp,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY qual_fp ASC, doc_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM q
) WHERE 4 * rk > cnt
"""


@query(
    "x_quality_stratified_trim",
    _xstrat_sql(),
    doc=(
        "Domain-stratified quality trim: drop each source's bottom "
        "quality quartile (integer fixed-point score, (score, doc_id) "
        "total order). The quartile is the exact integer rank rule "
        "4·rank > count — no interpolated percentile to disagree "
        "across engines. One shuffle on the source key; per-domain "
        "windows, so a pristine domain never starves a noisy one the "
        "way a global cut does."
    ),
)
def x_quality_stratified_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import stopword_hits, ws_tokens

    d = read_table(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        "source",
        stopword_hits("text").alias("n_stop"),
        F.size(ws_tokens("text")).alias("n_tok"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.length("text").alias("n_chars"),
    ).select(
        "doc_id",
        "source",
        F.expr(
            "CAST((1048576 * n_stop) div (2 * n_tok)"
            " + (1048576 * n_alpha) div (2 * n_chars) AS BIGINT)"
        ).alias("qual_fp"),
    )
    by_src = Window.partitionBy("source")
    rk = F.row_number().over(
        by_src.orderBy(F.col("qual_fp").asc(), F.col("doc_id").asc())
    )
    cnt = F.count(F.lit(1)).over(by_src)
    return (
        q.withColumn("rk", rk)
        .withColumn("cnt", cnt)
        .filter(F.lit(4) * F.col("rk") > F.col("cnt"))
        .select("doc_id", "source", "qual_fp")
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (TPC-H Q21 shape):
# EXISTS + NOT EXISTS over a fact self-reference → semi + anti join
# ---------------------------------------------------------------------------

_Q21_REGION = "EUROPE"

_Q21_SQL = f"""
WITH lw AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, n.n_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lw l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{_Q21_REGION}'
  AND l1.late
  AND EXISTS (
    SELECT 1 FROM lw l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lw l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.late
  )
GROUP BY s.s_name, n.n_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 100
"""


@query(
    "q21_suppliers_kept_waiting",
    _Q21_SQL,
    doc=(
        "TPC-H Q21 shape — the canonical EXISTS + NOT-EXISTS planner "
        "stress: late lines on completed multi-supplier orders where "
        "this supplier was the ONLY late one. The correlated "
        "subqueries become a LEFT SEMI join (another supplier exists "
        "on the order) and a LEFT ANTI join (no OTHER supplier was "
        "late), both on the shared l_orderkey equi-key with the "
        "supplier-inequality as a residual condition — so all three "
        "fact legs reuse ONE hash-partitioning on orderkey (the "
        "orders⋈lineitem lateness subtree is persisted and feeds all "
        "three). nation/region broadcast (25/5 rows at any scale); "
        "supplier shuffles on its natural key; TakeOrdered top-100. "
        "Lateness derives from shipdate vs orderdate because the "
        "testdata carries no commit/receipt dates — the semi/anti "
        "decorrelation shape this query exists to pin is unchanged."
    ),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import track_persist

    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lw = track_persist(
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("late"),
        )
    )
    l1 = lw.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = lw.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lw.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    only_late = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q21_REGION
    )
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        only_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )
