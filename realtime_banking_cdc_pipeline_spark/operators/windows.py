"""Window-function analytics operators.

Covers the reference's window surface (W1 lives in ``dedup.py``) plus
the analytics the README gestures at: z-score anomaly detection
(``readme.md:252,403-404``, A5 in SURVEY.md §2.4), top-K ops queries
(``readme.md:388-394``, O1), and sessionization for transaction-velocity
/ fraud analytics (``readme.md:408-412``).

All are single-shuffle window evaluations partitioned by the group key —
no global sort. Top-K per group uses row_number (not a global orderBy),
and global top-K should go through ``orderBy(...).limit(k)`` which Spark
executes as TakeOrdered (per-partition heap, no full sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[str | Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-K rows per group, by ``order_by`` (deterministic when the
    ordering includes a unique tiebreak column).

    String entries rank descending (recency/size semantics); Column
    entries are used as-is so callers control direction
    (``F.col(c).asc()`` / ``.desc()``).
    """
    ordering = [F.col(c).desc() if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def zscore_anomalies(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates > ``threshold`` sigmas from their
    group's mean (A5). Uses exact two-pass moments via a window so each
    row keeps its identity; sample stddev (n-1) like Spark/DuckDB
    ``stddev`` defaults."""
    w = Window.partitionBy(*group_cols)
    mu = F.avg(value_col).over(w)
    sigma = F.stddev(value_col).over(w)
    return (
        df.withColumn("zscore", (F.col(value_col) - mu) / sigma)
        .filter(F.abs(F.col("zscore")) > threshold)
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_minutes: float,
    session_col: str = "session_id",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_minutes``.

    Classic lag + cumulative-sum formulation (one window shuffle),
    microsecond-exact gap arithmetic. The streaming twin is
    ``F.session_window`` in streaming/analytics.py.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    gap_us = F.lit(int(gap_minutes * 60 * 1_000_000))
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us)
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
