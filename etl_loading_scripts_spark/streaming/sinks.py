"""Streaming sinks: merge each micro-batch into a persisted table.

The reference's dimension-maintenance MERGE (O4) lifted to Structured
Streaming: ``foreachBatch`` hands every micro-batch to the same join-based
``merge_upsert`` used in batch, and the result is republished atomically.
This is the standard "streaming upsert" topology (Kafka → dim table) that
Delta's ``MERGE INTO`` serves natively — ``merge_upsert_delta`` slots in
unchanged when delta-spark is present.

Exactly-once: the parquet fallback is at-least-once across restarts (a
batch can re-merge after a crash between publish and checkpoint commit) —
but ``merge_upsert`` is idempotent on its keys, so replays converge.
Delta's txn log upgrades this to exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_loading_scripts_spark.operators.mutations import merge_upsert
from etl_loading_scripts_spark.operators.publish import publish_table


def foreach_batch_upsert(
    spark: SparkSession,
    target_path: str,
    on: list[str],
    transform=None,
):
    """Build a ``foreachBatch`` callback that merges each micro-batch into
    the parquet table at ``target_path``.

    ``transform`` (optional) pre-aggregates the raw batch — e.g. per-key
    totals — before the merge; it must emit one row per key (merge_upsert's
    dedup contract).

    Scale: state lives in the table, not executor memory — the merge
    shuffles on ``on`` (or broadcasts the batch when small vs the target),
    so arbitrarily large dimensions stream-maintain without a state store.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch = transform(batch_df) if transform is not None else batch_df
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, batch, on=on)
        else:
            merged = batch
        # the merge plan lazily reads target_path; materialize via the
        # atomic publish (write tmp → swap) so we never overwrite an input
        # we are still reading
        publish_table(merged, target_path)

    return _apply
