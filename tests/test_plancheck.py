"""Structural broadcast-safety proofs (`plancheck`, VERDICT r5 item 4):
broadcast_scalar must accept exactly the by-construction-bounded shapes
and reject anything whose smallness is a data property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.plancheck import (
    bnlj_builds_bounded,
    broadcast_scalar,
    literal_table,
    plan_is_bounded,
)


def _bounded(df, max_rows=64):
    return plan_is_bounded(df._jdf.queryExecution().sparkPlan(), max_rows)


def test_accepts_global_aggregate(spark, sf_dir):
    stats = load_table(spark, sf_dir, "orders").agg(
        F.sum("o_totalprice").alias("total"), F.count("*").alias("n")
    )
    assert _bounded(stats)
    broadcast_scalar(stats)  # must not raise
    # and through a projection/filter wrapper
    assert _bounded(stats.select((F.col("total") / F.col("n")).alias("avg")))


def test_accepts_values_literals_range_and_limit(spark):
    lags = literal_table(spark, [(1, 0.5), (2, 0.25)], "lag int, w double")
    assert _bounded(lags)
    assert [tuple(r) for r in lags.collect()] == [(1, 0.5), (2, 0.25)]
    assert _bounded(spark.range(10))
    assert not _bounded(spark.range(1000))
    assert _bounded(spark.range(1000).limit(5))


def test_accepts_products_and_unions_of_bounded(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = orders.agg(F.count("*").alias("n"))
    b = orders.agg(F.max("o_totalprice").alias("m"))
    assert _bounded(a.crossJoin(b))
    assert _bounded(a.select(F.col("n").alias("v")).union(b.select(F.col("m").cast("long").alias("v"))))


def test_rejects_data_bounded_shapes(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    # corpus scan: obviously not
    assert not _bounded(orders)
    # filter-derived subset: small TODAY, unbounded as a plan property
    assert not _bounded(orders.filter(F.col("o_orderkey") < 10))
    # grouped aggregate: key cardinality is a data property
    assert not _bounded(orders.groupBy("o_orderpriority").count())
    # createDataFrame literals plan as RDD scans — not statically countable
    assert not _bounded(spark.createDataFrame([(1,)], "x int"))
    with pytest.raises(ValueError, match="not provably bounded"):
        broadcast_scalar(orders.filter(F.col("o_orderkey") < 10))


def test_bnlj_detection_matches_build_side(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    total = orders.agg(F.sum("o_totalprice").alias("t"))
    good = orders.join(
        broadcast_scalar(total), F.col("o_totalprice") * 100 > F.col("t"), "inner"
    )
    assert bnlj_builds_bounded(good) == [True]
    # swapped: the corpus side broadcast — must measure unproven
    tiny = spark.range(3)
    bad = tiny.join(
        F.broadcast(orders), F.col("o_orderkey") > F.col("id"), "inner"
    )
    assert bnlj_builds_bounded(bad) == [False]
    # no BNLJ at all → empty list
    assert bnlj_builds_bounded(orders.limit(3)) == []


def test_literal_table_quoting_and_nulls(spark):
    df = literal_table(
        spark,
        [("o'brien", None, True), ("plain", 2.5, False)],
        "name string, v double, flag boolean",
    )
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("o'brien", None, True), ("plain", 2.5, False)]
