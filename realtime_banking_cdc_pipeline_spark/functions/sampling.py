"""Deterministic dataset splitting & sampling for training pipelines.

A 100 TB corpus can't use ``randomSplit`` (non-reproducible across
re-runs and partitioning changes): assignment must be a pure function
of the row key. We hash the key with md5 (the engine-portable hash used
everywhere in this repo — see functions/similarity.md5_long), take a
bucket in [0, 100), and map bucket ranges to split names. Adding data,
repartitioning, or re-running never moves an existing row between
splits — the property training reproducibility depends on.

Scale shape: a single narrow projection — no shuffle, no state; the
split column then serves as a partition column for the write so each
split lands in its own parquet subtree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import md5_long

SPLIT_BUCKETS = 100


def split_bucket(key: Column, salt: str = "split-v1") -> Column:
    """Stable bucket in [0, 100) from md5(salt || key). The salt
    versions the assignment: bump it to deal a fresh split without
    correlation to the previous one."""
    h = md5_long(F.concat(F.lit(salt + ":"), key.cast("string")))
    return (h % F.lit(SPLIT_BUCKETS)).cast("int")


def assign_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int] | None = None,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic ``split`` column. ``splits`` maps name →
    bucket share (must sum to SPLIT_BUCKETS); default 90/5/5
    train/validation/test."""
    splits = splits or {"train": 90, "validation": 5, "test": 5}
    if sum(splits.values()) != SPLIT_BUCKETS:
        raise ValueError(f"split shares must sum to {SPLIT_BUCKETS}: {splits}")
    b = split_bucket(F.col(key_col), salt=salt)
    expr = None
    lo = 0
    for name, share in splits.items():
        cond = b < F.lit(lo + share)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += share
    return df.withColumn(out_col, expr)


def importance_keep(
    key: Column, p_micro: Column, salt: str = "imp-v1"
) -> Column:
    """Deterministic importance/rejection sampling: keep a row iff its
    md5-uniform draw (in micro-units, [0, 1e6)) falls below the row's
    keep probability ``p_micro`` (also micro-units). Pure integer
    compare — no double thresholds to drift across engines — and a
    pure function of (salt, key): re-runs, repartitions and appends
    never flip a kept row. The quality-weighted downsampling primitive
    for corpus mixing."""
    u = md5_long(F.concat(F.lit(salt + ":"), key.cast("string"))) % F.lit(1_000_000)
    return u < p_micro
