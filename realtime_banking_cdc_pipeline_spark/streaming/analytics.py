"""Streaming analytics: event-time windowed aggregates (SURVEY.md §2.8).

The reference has no event-time constructs — freshness is operational
only (readme.md:229-232) — but its README gestures at transaction-
velocity / fraud analytics (readme.md:408-412). These are their
idiomatic Spark forms; each works on a streaming OR batch DataFrame
(identical semantics, which the tests exploit)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, ts_col: str, key_cols: list[str],
    window: str = "10 minutes", watermark: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling-window counts (+ optional sum) per key."""
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("total_value"))
    return df.groupBy(F.window(ts_col, window).alias("w"), *key_cols).agg(*aggs)


def sliding_velocity(
    events: DataFrame, ts_col: str, key_col: str,
    window: str = "10 minutes", slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window event velocity per key — the fraud-ish
    transactions-per-interval signal."""
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, window, slide).alias("w"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("n_events"))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: rows pair when keys match
    and ``right_ts`` lands in [left_ts, left_ts + upper] — the txn↔txn
    correlation shape (e.g. a TRANSFER matched to its counterparty leg,
    a login matched to the purchases it preceded).

    Both sides carry watermarks so Spark can bound the join state: a
    buffered left row is dropped once the right watermark passes
    left_ts + upper (and vice versa). Without the time-range condition
    a stream-stream join would need unbounded state — Spark rejects it;
    this IS the scalable form. Works identically on batch frames (no
    watermark applied), which the tests exploit for a twin check.
    """
    lw, rw = left, right
    if left.isStreaming:
        lw = lw.withWatermark(left_ts, watermark)
    if right.isStreaming:
        rw = rw.withWatermark(right_ts, watermark)
    l_, r_ = lw.alias("l"), rw.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return l_.join(r_, cond, how)


def session_aggregates(
    events: DataFrame, ts_col: str, key_col: str,
    gap: str = "30 minutes", watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per key — the streaming twin of
    operators.windows.sessionize."""
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("w"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("n_events"))


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    hint_broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the routine CDC pattern (attach
    dimension attributes to a flowing fact). Spark re-evaluates the
    static side per micro-batch, so a dim TABLE read here picks up
    slowly-changing updates between batches for free. The broadcast
    hint is the right default (dims are bounded); pass
    ``hint_broadcast=False`` for an unbounded-ish static side and let
    the planner decide. Works identically on a batch ``stream`` — the
    tests exploit that equivalence."""
    d = F.broadcast(dim) if hint_broadcast else dim
    return stream.join(d, on=on, how=how)
