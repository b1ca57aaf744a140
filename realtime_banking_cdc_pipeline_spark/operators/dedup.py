"""Deduplication operators.

``dedup_latest`` is the workhorse of the whole reference pipeline (W1 in
SURVEY.md §2.5): every staging model collapses multiple CDC images of a
row to the newest via ``row_number() OVER (PARTITION BY id ORDER BY
created_at DESC)`` then ``rn = 1`` (``stg_customers.sql:11-14,26``,
``stg_accounts.sql:12-15,28``).

Determinism note: the reference orders only by ``created_at``, which is
unchanged on UPDATE — an under-determined tiebreak. The engine requires
explicit tiebreak columns (typically the Debezium ``ts_ms`` and the
monotonic ``lsn``/event id) so results are stable across runs and
engines.

Scale: both operators are a single hash-shuffle on the key — no global
sort, no driver-side state. At 100 TB prefer feeding them from a source
already bucketed/partitioned by the key so the exchange is elided.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    keep_order_col: bool = False,
) -> DataFrame:
    """Keep the newest row per key.

    ``order_by`` columns are ranked descending in the given priority
    order (first column is the primary recency measure, the rest break
    ties). Equivalent SQL::

        SELECT * EXCEPT (rn) FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY <keys> ORDER BY <o1> DESC, <o2> DESC, ...) rn
          FROM t) WHERE rn = 1
    """
    ordering = [
        (F.col(c) if isinstance(c, str) else c).desc() for c in order_by
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out.drop("__rn")


def dedup_exact(
    df: DataFrame,
    on: Sequence[str],
    canonical_order: Sequence[str] | None = None,
) -> DataFrame:
    """Exact duplicate removal over ``on`` columns.

    With ``canonical_order`` the survivor is deterministic (the row
    minimizing those columns); without it this is ``dropDuplicates``
    (arbitrary survivor — fine when the duplicate rows are identical).
    Single shuffle on the dedup key either way.
    """
    if canonical_order is None:
        return df.dropDuplicates(list(on))
    ordering = [F.col(c).asc() for c in canonical_order]
    w = Window.partitionBy(*on).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
