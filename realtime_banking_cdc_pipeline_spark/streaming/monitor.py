"""Operational monitoring (SURVEY.md §2.8: freshness is an *ops metric*
in the reference — target <5 min, alert >15 min, readme.md:229-232 —
not a query construct).

``PipelineMonitor`` wraps Spark's StreamingQueryListener: per-batch
input rates, processing durations, and event-time freshness lag
(watermark vs wall clock), with a threshold check that plays the role
of the reference's dashboard alert."""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    batch_id: int
    num_input_rows: int
    duration_ms: float | None
    watermark: str | None
    observed: dict = field(default_factory=dict)


@dataclass
class PipelineMonitor(StreamingQueryListener):
    """Collects per-batch metrics; ``freshness_lag_seconds`` reports how
    far the event-time watermark trails wall clock."""

    metrics: list[BatchMetric] = field(default_factory=list)
    _last_watermark: str | None = None

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration = p.durationMs.get("triggerExecution") if p.durationMs else None
        wm = p.eventTime.get("watermark") if p.eventTime else None
        if wm:
            self._last_watermark = wm
        # df.observe(...) metrics ride the progress event: per-batch
        # business counters (rows kept/dropped/quarantined) computed
        # inside the running query — no second pass over the data.
        observed = {}
        try:
            for name, row in (p.observedMetrics or {}).items():
                observed[name] = row.asDict()
        except Exception:  # malformed progress must not kill the listener
            observed = {}
        self.metrics.append(
            BatchMetric(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=duration,
                watermark=wm,
                observed=observed,
            )
        )

    def observed_totals(self) -> dict[str, dict[str, float]]:
        """Sum each observed numeric metric across batches:
        {observation_name: {column: total}}."""
        totals: dict[str, dict[str, float]] = {}
        for m in self.metrics:
            for name, row in m.observed.items():
                slot = totals.setdefault(name, {})
                for k, v in row.items():
                    if isinstance(v, (int, float)) and v is not None:
                        slot[k] = slot.get(k, 0) + v
        return totals

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- dashboard-style accessors ---------------------------------------

    def total_input_rows(self) -> int:
        return sum(m.num_input_rows for m in self.metrics)

    def freshness_lag_seconds(self, now: dt.datetime | None = None) -> float | None:
        """Wall-clock minus last event-time watermark (None before any
        watermark advances, or on an unparseable watermark string — a
        monitoring accessor must not raise into the ops-alert path)."""
        if not self._last_watermark:
            return None
        try:
            # fromisoformat handles both with and without fractional
            # seconds (strptime's single %f format did not)
            wm = dt.datetime.fromisoformat(self._last_watermark.replace("Z", "+00:00"))
        except ValueError:
            return None
        now = now or dt.datetime.now(dt.timezone.utc)
        if now.tzinfo is None:
            now = now.replace(tzinfo=dt.timezone.utc)
        return (now - wm).total_seconds()

    def check_freshness(self, target_seconds: float, now: dt.datetime | None = None) -> bool:
        """The reference's dashboard alert (<5 min target): True when the
        pipeline is within target. Historical replays legitimately lag —
        callers pass a reference 'now' for deterministic tests."""
        lag = self.freshness_lag_seconds(now)
        return lag is not None and lag <= target_seconds


def attach(spark: SparkSession) -> PipelineMonitor:
    m = PipelineMonitor()
    spark.streams.addListener(m)
    return m


def detach(spark: SparkSession, monitor: PipelineMonitor) -> None:
    spark.streams.removeListener(monitor)
