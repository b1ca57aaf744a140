"""Streaming distinct-count monitoring via the deterministic HLL
register store (functions/sketches.py).

Unlike the signature/gram stores (corpus.py, substr.py), the HLL
register store needs NO epoch bookkeeping for exactly-once CORRECTNESS:
max-merge is idempotent, so a replayed batch folds to the identical
store. Epoch partitioning here exists for CRASH SAFETY instead: each
micro-batch writes ONLY its own ``epoch=<id>`` partition, so no write
ever clears accumulated history — a driver/executor failure mid-write
can at worst lose the in-flight batch's partition, which the replayed
batch rewrites identically. (The previous whole-store ``overwrite``
cleared the target directory while the merged frame lived only in
executor localCheckpoint blocks; a crash there lost every register.)

The fold happens on READ (``read_hll_store``), and periodic compaction
keeps the partition count bounded: the fold of all partitions is
written to a fresh ``epoch=-<e>`` base partition (never a source of
the fold, so sources stay on disk untouched during the write), then
the subsumed partitions are deleted. Every crash window re-folds to
the same registers by idempotence of max — leftover partitions are
cleanup debt, never corruption.

State stays constant-size: at most HLL_M rows per key per partition,
and ≤ ``compact_every`` + 1 partitions between compactions.

Reference analog: the reference has no incremental distinct counts at
all — its dashboards re-aggregate marts (`models/gold/*.sql`); this is
the training-data-pipeline monitoring extension.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..functions.sketches import hll_registers, merge_hll_registers


def read_hll_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Fold every epoch partition into one register row per
    (key, bucket) — the store's logical value."""
    store = spark.read.parquet(store_path)
    if "epoch" in store.columns:
        store = store.drop("epoch")
    return merge_hll_registers(store)


def _epoch_ids(store_path: str) -> list[int]:
    return [
        int(name.split("=", 1)[1])
        for name in os.listdir(store_path)
        if name.startswith("epoch=")
    ]


def compact_hll_store(
    spark: SparkSession, store_path: str, epoch_id: int
) -> None:
    """Fold all current partitions into the fresh base partition
    ``epoch=-<epoch_id>`` and delete the subsumed ones.

    Crash-safe by construction: the write target is never one of the
    fold's sources (batch partitions are ≥ 0, earlier bases are
    ``-e'`` with ``e' < epoch_id``), so sources remain on disk until
    the new base is fully committed; any partition left behind by a
    crash mid-delete re-folds idempotently and is removed by the next
    compaction.

    A REPLAYED compaction epoch does NOT rewrite the base — that would
    make ``epoch=-<epoch_id>`` both a fold source and the overwrite
    target, re-opening the clear-then-crash register-loss window this
    layout exists to close. A base with a ``_SUCCESS`` marker is
    durable: only leftover source partitions are cleared. A base
    WITHOUT the marker is a crashed partial write (sources still on
    disk — deletion only runs after commit), so it is dropped and
    refolded.
    """
    if epoch_id <= 0:
        raise ValueError("compaction epoch must be positive")
    existing = _epoch_ids(store_path)
    base = os.path.join(store_path, f"epoch=-{int(epoch_id)}")
    if os.path.exists(base):
        if os.path.exists(os.path.join(base, "_SUCCESS")):
            for e in existing:
                if e != -int(epoch_id):
                    shutil.rmtree(
                        os.path.join(store_path, f"epoch={e}"),
                        ignore_errors=True,
                    )
            return
        shutil.rmtree(base, ignore_errors=True)
    folded = read_hll_store(spark, store_path).localCheckpoint(eager=True)
    folded.write.mode("overwrite").parquet(
        os.path.join(store_path, f"epoch=-{int(epoch_id)}")
    )
    for e in existing:
        if e != -int(epoch_id):
            shutil.rmtree(
                os.path.join(store_path, f"epoch={e}"), ignore_errors=True
            )


def update_hll_store(
    batch_df: DataFrame,
    store_path: str,
    key_col: str,
    value_col: str,
    epoch_id: int = 0,
    compact_every: int | None = None,
) -> DataFrame:
    """Fold one micro-batch into the register store; returns the folded
    register table. Safe under replays — the batch's partition is
    rewritten identically, and merging twice is a no-op by idempotence
    of max. Never touches any other partition (crash-safe: history
    cannot be lost by a failure mid-write)."""
    spark = batch_df.sparkSession
    batch_regs = merge_hll_registers(
        hll_registers(batch_df, key_col, value_col)
    )
    batch_regs.write.mode("overwrite").parquet(
        os.path.join(store_path, f"epoch={int(epoch_id)}")
    )
    if compact_every and epoch_id > 0 and epoch_id % compact_every == 0:
        compact_hll_store(spark, store_path, epoch_id)
    return read_hll_store(spark, store_path)


def start_distinct_monitor(
    spark: SparkSession,
    src_path: str,
    store_path: str,
    checkpoint: str,
    schema,
    key_col: str,
    value_col: str,
    max_files_per_trigger: int = 1,
    compact_every: int = 16,
):
    """File-source streaming wrapper: every micro-batch folds into the
    HLL register store (own epoch partition; compacted every
    ``compact_every`` batches). availableNow drains then stops (test
    mode); drop the trigger for a continuous monitor."""

    def on_batch(batch_df: DataFrame, epoch: int) -> None:
        update_hll_store(
            batch_df,
            store_path,
            key_col,
            value_col,
            epoch_id=epoch,
            compact_every=compact_every,
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(src_path)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
