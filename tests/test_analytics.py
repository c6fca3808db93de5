"""Accuracy tests for the sketch-based analytics (no exact oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.queries import REGISTRY


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r["o_orderpriority"]: r["approx_clients"]
        for r in REGISTRY["approx_distinct_clients"].spark(spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["exact"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.05, (k, approx[k], e)
