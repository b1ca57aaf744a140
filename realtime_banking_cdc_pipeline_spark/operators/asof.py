"""As-of (nearest-earlier) join — an operator Spark lacks natively.

Implemented as the scalable union-tag + window-carry composition rather
than ``pd.merge_asof`` per group: tag both inputs, union, and for each
right-side row carry the latest left-side attributes forward with
``last(..., ignorenulls)`` over an event-time window partitioned by the
key. One shuffle on the key, no Python, no per-group pandas — at 100 TB
this behaves exactly like any other single-window operator (skew on the
key is the only hazard, same as the dedup operator).

DuckDB expresses the same thing natively (``ASOF JOIN``), which the
oracle uses — a nice cross-check that the composition is faithful.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    strict: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For every row of ``left``, attach ``payload_cols`` from the most
    recent ``right`` row with the same key and ``right.ts <= left.ts``
    (``<`` when ``strict``).

    Equal timestamps: with ``strict=False`` a right row at exactly
    ``left.ts`` matches (ordered before the left row via a side rank);
    ``tiebreak_col`` disambiguates multiple right rows at one instant
    (latest wins).
    """
    lcols = left.columns
    # side: right rows sort before left rows at equal ts in non-strict
    # mode (so the left row sees them), after in strict mode.
    side_right, side_left = (0, 1) if not strict else (1, 0)
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)

    l_tagged = left.select(
        *lcols,
        F.lit(side_left).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in key_cols and c != ts_col],
        *[F.col(c) for c in key_cols],
        F.col(ts_col),
        F.lit(side_right).alias("__side"),
        tb.cast("long").alias("__tb"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    ).select(*lcols, "__side", "__tb", *[f"__p_{c}" for c in payload_cols])

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        F.col("__side"),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("__side") == side_left).drop("__side")
