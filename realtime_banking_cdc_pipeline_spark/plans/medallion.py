"""Medallion pipeline orchestration (SURVEY.md §3): the reference's
Kafka→MinIO→Snowflake→dbt chain collapsed into one deterministic
function pipeline — Bronze normalize → Silver staging → SCD2 snapshots
→ Gold star schema — runnable per micro-batch (streaming foreachBatch)
or per scheduled run (batch), no orchestrator required
(scd_snapshots.py:22-29 becomes a function call).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import (
    expect_empty,
    orphan_rows,
    violations_duplicate_key,
    violations_multiple_current,
    violations_non_positive,
    violations_null,
)
from ..operators.scd2 import scd2_merge_images
from ..schemas import SCD2_CHECK_COLS, TABLE_SCHEMAS
from ..sources.cdc import parse_envelope, to_bronze_rows
from .gold import build_dim, build_fact_transactions
from .silver import stg_accounts, stg_customers, stg_transactions


@dataclass
class MedallionState:
    """Persisted-between-runs tables (in connector mode these live as
    Delta/parquet paths; tests hold them as DataFrames)."""

    snapshots: dict[str, DataFrame | None]
    fact: DataFrame | None

    @classmethod
    def empty(cls) -> "MedallionState":
        return cls(snapshots={"customers": None, "accounts": None}, fact=None)


def bronze_from_kafka_frames(
    frames: DataFrame, drop_deletes: bool = True
) -> dict[str, DataFrame]:
    """Kafka-framed fixture rows (topic/key/value/ts) → per-table Bronze
    row images. Topic fan-out is a filter per table — with the real
    Kafka source this is one multi-topic stream split by the ``topic``
    column (kafka_to_minio.py:55-59's per-topic buffers, declaratively)."""
    out = {}
    for table in TABLE_SCHEMAS:
        raw = frames.filter(F.col("topic").endswith("." + table))
        events = parse_envelope(raw, table)
        out[table] = to_bronze_rows(events, drop_deletes=drop_deletes)
    return out


def run_silver(bronze: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Current-row staging views (W1-deduped) plus full change-image
    variants for the SCD2 snapshots."""
    return {
        "customers": stg_customers(bronze["customers"]),
        "accounts": stg_accounts(bronze["accounts"]),
        "transactions": stg_transactions(bronze["transactions"]),
        "customers_images": stg_customers(bronze["customers"], latest_only=False),
        "accounts_images": stg_accounts(bronze["accounts"], latest_only=False),
    }


def run_snapshots(
    state: MedallionState, silver: dict[str, DataFrame]
) -> MedallionState:
    """dbt-snapshot equivalent (C1), upgraded: every change image in the
    batch opens/closes a version (the reference's daily snapshot cadence
    silently drops intra-day versions — SURVEY.md §7 phase-2 risk).
    Effective time is the CDC event time (``event_ts``; ``created_at``
    is frozen on UPDATE in this schema), lsn breaks equal-ms ties."""
    key_cols = {"customers": "customer_id", "accounts": "account_id"}
    for table in ("customers", "accounts"):
        state.snapshots[table] = scd2_merge_images(
            state.snapshots[table],
            silver[f"{table}_images"].drop("load_timestamp"),
            key=key_cols[table],
            check_cols=SCD2_CHECK_COLS[table],
            as_of_col="event_ts",
            tiebreak_cols=["lsn"],
            # delete propagation: a tombstone closes the open version and
            # opens nothing (in compat mode every _deleted is False and
            # this is a no-op) — the reference's known gap, SURVEY §2.1
            deleted_col="_deleted",
        )
    return state


def run_gold(
    state: MedallionState, silver: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    dims = {
        "dim_customers": build_dim(state.snapshots["customers"]),
        "dim_accounts": build_dim(state.snapshots["accounts"]),
    }
    state.fact = build_fact_transactions(
        silver["transactions"],
        silver["accounts"],
        existing_fact=state.fact,
    )
    return {**dims, "fact_transactions": state.fact}


def run_pipeline(
    spark: SparkSession,
    frames: DataFrame,
    state: MedallionState | None = None,
    drop_deletes: bool = True,
) -> tuple[MedallionState, dict[str, DataFrame]]:
    """One full batch: Kafka frames → Bronze → Silver → snapshots → Gold."""
    state = state or MedallionState.empty()
    bronze = bronze_from_kafka_frames(frames, drop_deletes=drop_deletes)
    silver = run_silver(bronze)
    state = run_snapshots(state, silver)
    gold = run_gold(state, silver)
    return state, gold


def run_quality_suite(gold: dict[str, DataFrame]) -> None:
    """T1-T6 (readme.md:196-224) as hard assertions after every build."""
    fact = gold["fact_transactions"]
    dim_a = gold["dim_accounts"]
    expect_empty(violations_duplicate_key(fact, ["transaction_id"]), "T1 unique txn id")
    expect_empty(
        violations_null(fact, ["transaction_id", "account_id", "amount"]),
        "T2 not_null critical fact cols",
    )
    expect_empty(violations_non_positive(fact, "amount"), "T3 positive_amount")
    expect_empty(
        orphan_rows(fact.select("account_id"), dim_a, "account_id"),
        "T5 no orphan facts",
    )
    for name in ("dim_customers", "dim_accounts"):
        key = "customer_id" if name == "dim_customers" else "account_id"
        snap = gold[name].withColumnRenamed("effective_to", "valid_to")
        expect_empty(
            violations_multiple_current(snap, key), f"T6 single current row {name}"
        )
