"""Accuracy tests for the sketch-based analytics (no exact oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.queries import REGISTRY


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """The query now emits the tolerance invariant itself (VERDICT r1
    item 2): every group's HLL estimate must sit within 5% of exact."""
    rows = REGISTRY["approx_distinct_clients"].spark(spark, sf_dir).collect()
    exact = {
        r["o_orderpriority"]: r["exact"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    assert {r["o_orderpriority"] for r in rows} == set(exact)
    for r in rows:
        assert r["within_5pct"] == 1, r
        assert r["exact_clients"] == exact[r["o_orderpriority"]]
