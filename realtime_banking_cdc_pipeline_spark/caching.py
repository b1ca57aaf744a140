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
_TRACKED_RDDS: list = []  # (SparkContext, rdd_id) pairs from localCheckpoints


def track_persist(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for later bulk release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def track_local_checkpoint(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` + register its checkpoint RDD for
    ``release_caches``.

    The iterative graph operators cut lineage with eager
    localCheckpoints; those blocks live in executor storage but are NOT
    in the CacheManager, so ``DataFrame.unpersist`` is a no-op on them
    and a long sweep (212 registry queries back-to-back) accumulates
    them until the JVM heap fills. The checkpointed RDD only surfaces
    in ``SparkContext.getPersistentRDDs`` — we diff that registry
    around the checkpoint call (query builds are driver-side
    sequential, so the diff is exactly this call's RDD) and record the
    id; ``release_caches`` unpersists it by id.

    Caveat vs ``track_persist``: a freed localCheckpoint cannot be
    recomputed (lineage is gone) — releasing must happen BETWEEN
    queries, after results are consumed, which is already the
    ``release_caches`` contract.
    """
    sc = df.sparkSession.sparkContext
    try:
        before = {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    except Exception:
        return df.localCheckpoint(eager=True)  # registry unavailable (Connect)
    out = df.localCheckpoint(eager=True)
    try:
        for i in sc._jsc.getPersistentRDDs().keySet().toArray():
            if int(i) not in before:
                _TRACKED_RDDS.append((sc, int(i)))
    except Exception:
        pass
    return out


def release_caches() -> int:
    """Unpersist every tracked frame and checkpoint RDD
    (blocking=False); returns how many were released. Safe to call at
    any time between queries — frames already executed simply drop
    their blocks; frames never executed drop nothing. Do NOT call while
    a returned-but-not-yet-collected frame depends on a tracked
    localCheckpoint (those cannot recompute)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped — nothing to release
            pass
    while _TRACKED_RDDS:
        sc, rid = _TRACKED_RDDS.pop()
        try:
            jmap = sc._jsc.getPersistentRDDs()
            if jmap.containsKey(rid):
                jmap.get(rid).unpersist(False)
                n += 1
        except Exception:
            pass
    return n
