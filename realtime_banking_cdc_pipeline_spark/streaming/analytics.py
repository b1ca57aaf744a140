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
