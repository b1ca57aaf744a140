"""Session-scoped cache registry.

Several operators persist() an intermediate frame that is read by more
than one downstream join (LSH signatures, hyperplane buckets, scored
corpus subtrees). A query-builder function cannot unpersist that frame
itself — the returned DataFrame is lazy, and the cache must be live
when the CALLER finally executes it. Left alone, every invocation in a
long-lived session (a driver looping over 65 queries, a notebook, a
scheduled job) leaks cached blocks into executor storage memory.

``track_persist`` is the persist() those operators use: it registers
the frame in a module-level list so hosts can bulk-release between
queries with ``release_caches()`` — bench.py does this between timed
queries, tools/driver_sim.py between correctness checks. Spark's
storage eviction (caches are LRU-evictable, not pinned) bounds the
damage if a host never calls it, but explicit release is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for later bulk release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (blocking=False); returns how many
    were released. Safe to call at any time — frames already executed
    simply drop their blocks; frames never executed drop nothing."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped — nothing to release
            pass
    return n
