"""Data-quality assertion operators (T1-T6 in SURVEY.md §2.11).

The reference specifies dbt tests — ``unique``, ``not_null``,
``relationships``, custom ``positive_amount``, orphan and
unique-current-SCD checks (``readme.md:196-224``) — as assertion
queries that must return zero rows. Each helper here returns the
*violating* rows; :func:`expect_empty` turns that into a hard check.

All checks are single-pass aggregations or anti-joins — fully
distributed, no driver-side iteration; the only action is the final
``isEmpty``/count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DataQualityError(AssertionError):
    pass


def violations_duplicate_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """T1 `unique`: keys appearing more than once (readme.md:198)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def violations_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """T2 `not_null` over critical fields (readme.md:199,202)."""
    cond = None
    for c in cols:
        expr = F.col(c).isNull()
        cond = expr if cond is None else (cond | expr)
    return df.filter(cond)


def violations_non_positive(df: DataFrame, col: str) -> DataFrame:
    """T3 custom `positive_amount` (readme.md:203; CHECK amount > 0,
    postgres/schema.sql:27)."""
    return df.filter(F.col(col) <= 0)


def orphan_rows(child: DataFrame, parent: DataFrame, key: str) -> DataFrame:
    """T4/T5 `relationships` / no-orphan-facts: child keys missing from
    the parent (readme.md:205-216) — left anti-join (J3)."""
    return child.join(parent.select(key).distinct(), key, "left_anti")


def violations_multiple_current(df: DataFrame, key: str) -> DataFrame:
    """T6: more than one open SCD2 version per key (readme.md:218-224)."""
    return (
        df.filter(F.col("is_current"))
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def expect_empty(df: DataFrame, name: str, sample: int = 5) -> None:
    """Assert a violation set is empty, in the spirit of `dbt test`."""
    rows = df.limit(sample).collect()
    if rows:
        raise DataQualityError(f"check {name!r} failed; sample violations: {rows}")
