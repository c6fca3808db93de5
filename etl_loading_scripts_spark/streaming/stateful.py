"""Custom stateful streaming via ``applyInPandasWithState``.

The engine's pattern for operators Structured Streaming lacks natively:
per-key mutable state carried across micro-batches, with the kernel in
Arrow-batched pandas. Demonstrated on running per-user totals (the same
plumbing hosts sessionization with timeouts, CDC compaction, etc.).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_loading_scripts_spark.catalog import (
    _normalize_nanos,
    stream_source_schema,
    table_path,
)
from etl_loading_scripts_spark.registry import register

_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total_micros long"


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per user across micro-batches; emit the
    running total each batch ('update'-mode semantics).

    State totals are integer micro-units (value quantized upstream):
    float accumulation order in a streaming kernel is not reproducible
    across engines, integer addition is."""
    n, total_micros = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_micros += int(pdf["value_micros"].sum())
    state.update((n, total_micros))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_micros / 1_000_000.0],
        }
    )


@register(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 AS total_value
    FROM events GROUP BY user_id
    """,
    doc="applyInPandasWithState: per-user running totals held in GroupState "
    "across micro-batches (update mode). Single-batch result ≡ the batch "
    "aggregate, giving the stateful path a strong oracle.",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: state lives in the state store partitioned by user_id; memory
    is bounded by |active keys| × state row size, spill-backed (RocksDB
    provider in production). The pandas kernel sees one key's batches at a
    time — no unbounded collect anywhere.

    Float note: the kernel sums float64 per key in arrival order — the
    oracle matches because per-key addition order is the file order on both
    engines at one micro-batch; the DECIMAL cast on the oracle side guards
    the representation only."""
    src = table_path(sf_dir, "events")
    stream_dir = os.path.join(
        tempfile.gettempdir(), f"events_stream_{hashlib.md5(src.encode()).hexdigest()[:8]}"
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    raw_schema, nanos_cols = stream_source_schema(spark, src)
    from pyspark.sql import functions as F

    stream = _normalize_nanos(
        spark.readStream.schema(raw_schema).parquet(stream_dir), nanos_cols
    ).select(
        "user_id",
        F.round(F.col("value") * 1_000_000).cast("long").alias("value_micros"),
    )
    stateful = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"stateful_out_{uuid.uuid4().hex[:8]}"
    q = stateful.writeStream.outputMode("update").format("memory").queryName(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(sink)
