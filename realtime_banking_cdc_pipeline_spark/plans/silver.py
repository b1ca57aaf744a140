"""Silver staging models (dbt staging views re-expressed as DataFrame
functions; SURVEY.md §3.2).

Each mirrors one reference model: typed projection + rename (P1/P2) +
dedup-latest (W1). The reference casts warehouse-side ids to *strings*
(``stg_customers.sql:5``, ``v:id::string``) — replicated here so Gold
schemas match FIXTURES.md §3. A ``load_timestamp`` audit column (P5) is
added like ``stg_*.sql``.

These are logical-plan aliases (dbt ``materialized='view'``): Catalyst
inlines them and prunes columns/predicates straight down to the Bronze
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_latest

# Bronze rows carry the wire types from sources/cdc.py: decimals as
# double, timestamps as epoch-micros longs (Debezium defaults).
_TS = lambda c: F.timestamp_micros(F.col(c))  # noqa: E731


def _deduped(bronze: DataFrame) -> DataFrame:
    # W1 with deterministic tiebreak: created_at DESC, ts_ms DESC, lsn DESC
    # (stg_customers.sql:11-14 orders by created_at only — under-determined;
    # see SURVEY.md §2.5 ordering note).
    return dedup_latest(bronze, ["id"], ["created_at", "ts_ms", "lsn"])


# CDC event-time audit columns. The reference's staging drops them, but
# its schema has no updated_at (postgres/schema.sql:4-10): created_at is
# frozen on UPDATE, so event time is the only usable SCD2 effective time
# and dedup tiebreak (SURVEY.md §2.5 ordering note). Gold models drop
# them at the boundary, matching the reference's output shapes.
_AUDIT = (
    lambda: (  # noqa: E731
        F.timestamp_millis(F.col("ts_ms")).alias("event_ts"),
        F.col("lsn"),
        F.current_timestamp().alias("load_timestamp"),
    )
)


def stg_customers(bronze_customers: DataFrame, latest_only: bool = True) -> DataFrame:
    """stg_customers.sql:5-26 — cast, rename, dedup-latest.

    ``latest_only=False`` keeps every change image (ordered by event
    time) — the input SCD2 snapshots need to build full version chains.
    """
    d = _deduped(bronze_customers) if latest_only else bronze_customers
    return d.select(
        F.col("id").cast("string").alias("customer_id"),
        F.col("first_name"),
        F.col("last_name"),
        F.col("email"),
        _TS("created_at").alias("created_at"),
        F.col("_deleted"),
        *_AUDIT(),
    )


# Money typing (SURVEY §1.2): the reference launders NUMBER(10,2) through
# JSON double (generate_and_post_connector.py:29) and casts back to FLOAT
# in staging (stg_accounts.sql:8). ``decimal=True`` instead carries
# DecimalType(18,2) end-to-end — exact sums, order-independent — with
# ``double_compat_view`` reproducing the reference's lossy shape for
# consumers that expect it. Default stays double for reference parity.
def _money(col_name: str, decimal: bool) -> Column:
    target = "decimal(18,2)" if decimal else "double"
    return F.col(col_name).cast(target).alias(col_name)


def double_compat_view(df: DataFrame, money_cols: list[str]) -> DataFrame:
    """The stg_accounts.sql:8 shape: decimal money re-cast to double for
    consumers written against the reference's FLOAT columns."""
    out = df
    for c in money_cols:
        out = out.withColumn(c, F.col(c).cast("double"))
    return out


def stg_accounts(
    bronze_accounts: DataFrame, latest_only: bool = True, decimal: bool = False
) -> DataFrame:
    """stg_accounts.sql:5-28."""
    d = _deduped(bronze_accounts) if latest_only else bronze_accounts
    return d.select(
        F.col("id").cast("string").alias("account_id"),
        F.col("customer_id").cast("string").alias("customer_id"),
        F.col("account_type"),
        _money("balance", decimal),
        F.col("currency"),
        _TS("created_at").alias("created_at"),
        F.col("_deleted"),
        *_AUDIT(),
    )


def stg_transactions(
    bronze_transactions: DataFrame, decimal: bool = False
) -> DataFrame:
    """stg_transactions.sql:4-11 — projection/rename, NO dedup in the
    reference (facts are append-only; duplicates handled by the
    incremental merge's unique_key)."""
    return bronze_transactions.select(
        F.col("id").cast("string").alias("transaction_id"),
        F.col("account_id").cast("string").alias("account_id"),
        F.col("txn_type").alias("transaction_type"),
        _money("amount", decimal),
        F.col("related_account_id").cast("string").alias("related_account_id"),
        F.col("status"),
        _TS("created_at").alias("transaction_time"),
        F.col("ts_ms"),
        F.col("lsn"),
        F.current_timestamp().alias("load_timestamp"),
    )
