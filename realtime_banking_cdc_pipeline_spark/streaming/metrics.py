"""Streaming distinct-count monitoring via the deterministic HLL
register store (functions/sketches.py).

Unlike the signature/gram stores (corpus.py, substr.py), the HLL
register store needs NO epoch bookkeeping for exactly-once: max-merge
is idempotent, so a replayed batch folds to the identical store —
at-least-once delivery IS exactly-once for this state. The store is
(key, bucket, m_j): at most HLL_M rows per key forever, the
constant-state property that makes this the streaming distinct-count
(per-source distinct documents, distinct users per window, ...).

Reference analog: the reference has no incremental distinct counts at
all — its dashboards re-aggregate marts (`models/gold/*.sql`); this is
the training-data-pipeline monitoring extension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.sketches import hll_registers, merge_hll_registers


def update_hll_store(
    batch_df: DataFrame,
    store_path: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Fold one micro-batch into the register store; returns the merged
    register table (also what was just written). Safe under replays —
    merging twice is a no-op by idempotence of max."""
    spark = batch_df.sparkSession
    batch_regs = hll_registers(batch_df, key_col, value_col)
    if os.path.exists(store_path):
        merged = merge_hll_registers(
            spark.read.parquet(store_path), batch_regs
        )
    else:
        merged = merge_hll_registers(batch_regs)
    merged = merged.localCheckpoint(eager=True)  # cut lineage before overwrite
    merged.write.mode("overwrite").parquet(store_path)
    return merged


def start_distinct_monitor(
    spark: SparkSession,
    src_path: str,
    store_path: str,
    checkpoint: str,
    schema,
    key_col: str,
    value_col: str,
    max_files_per_trigger: int = 1,
):
    """File-source streaming wrapper: every micro-batch folds into the
    HLL register store. availableNow drains then stops (test mode);
    drop the trigger for a continuous monitor."""

    def on_batch(batch_df: DataFrame, epoch: int) -> None:
        update_hll_store(batch_df, store_path, key_col, value_col)

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
