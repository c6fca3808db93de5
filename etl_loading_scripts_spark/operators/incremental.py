"""Incremental aggregate maintenance (materialized-summary merge).

The warehouse pattern behind every "refresh the monthly rollup" job: a
stored summary at grain G plus an increment of new facts produce the new
summary WITHOUT rescanning history — valid whenever the measures are
additive (SUM/COUNT; MIN/MAX merge too; AVG via sum+count; distinct via
HLL sketch merge, see ``approx_distinct_clients``).

Reference analogy: the monthly load's truncate-and-rebuild of summary
tables (SURVEY §3.1 stage 5) — this operator is the O(increment)
replacement the reference's full rebuild grows out of at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_aggregates(prior: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two same-schema additive summaries: union → one groupBy.

    Every non-key column must be additive (sums/counts, kept in exact
    types — merge DECIMAL sums as DECIMAL, cast to DOUBLE only at
    presentation, or merged floats drift from a recompute). Scale: the
    shuffle carries |prior ∪ delta| summary rows (grain-sized, tiny next
    to facts); with the summary table bucketed on ``keys`` the exchange
    disappears entirely."""
    measures = [c for c in prior.columns if c not in keys]
    if prior.columns != delta.columns:
        raise ValueError(f"summary schemas differ: {prior.columns} vs {delta.columns}")
    return (
        prior.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(m).alias(m) for m in measures])
    )
