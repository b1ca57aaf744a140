"""Skew mitigation for hot join keys (SURVEY.md 'Optimize for scale').

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) splits oversized sort-merge partitions at runtime and is
the first line of defense. Explicit salting remains necessary when the
skew is in an *aggregation* (one key dominating a groupBy) or when the
build side must replicate. Both helpers are pure DataFrame composition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side
    randomly into ``salt_buckets`` and replicate ``small`` across every
    bucket (explode), so one hot key spreads over N tasks instead of
    one straggler.

    ``small`` is replicated ×buckets — use only when it is broadcast-
    scale to begin with but the join key is too hot for a plain
    broadcast-build (e.g. billions of probe rows on one key).
    """
    salted_l = skewed.withColumn(
        "__salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    salted_r = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")


def skewproof_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT x) for skewed group keys.

    Plain sum/count groupBys don't need help (map-side partial
    aggregation absorbs skew), but COUNT DISTINCT materializes a hot
    key's whole distinct set on one reducer. Two-phase form: dedup
    shuffles on (key, x) — spread across reducers by x — then the
    count-per-key phase only moves partial counts.
    """
    phase1 = df.select(*keys, distinct_col).dropDuplicates([*keys, distinct_col])
    return phase1.groupBy(*keys).agg(F.count(F.lit(1)).alias(out_col))
