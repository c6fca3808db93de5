"""Tests: format round-trips, month-partitioned fact layout, salted join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.functions import tsql
from etl_loading_scripts_spark.operators.skew import salted_join
from etl_loading_scripts_spark.sources import (
    read_table,
    write_fact_partitioned,
    write_table,
)
from etl_loading_scripts_spark.sources.io import read_fact_month


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=src.schema)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in src.collect()
    )
    assert back.schema == src.schema


def test_csv_without_schema_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), fmt="csv")


def test_partitioned_fact_prunes_month(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        F.col("o_orderkey").alias("txn_id"),
        tsql.datekey("o_orderdate").alias("datekey"),
        F.col("o_totalprice").alias("amount"),
    )
    path = str(tmp_path / "fact")
    write_fact_partitioned(fact, path)

    month_df = read_fact_month(spark, path, 20000601, 20000630)
    expected = fact.filter(F.col("datekey").between(20000601, 20000630)).count()
    assert month_df.count() == expected

    # the month filter must reach the file listing as a partition filter
    plan = month_df._sc._jvm.PythonSQLUtils.explainString(
        month_df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "month" in plan.split("PartitionFilters", 1)[1][:200]


def test_salted_join_equals_plain_join(spark, sf_dir):
    # skewed fact: every lineitem of one hot supplier plus the rest
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    plain = li.join(supplier, li.l_suppkey == supplier.s_suppkey).select(
        "l_orderkey", "s_name"
    )
    salted = salted_join(
        li.withColumnRenamed("l_suppkey", "s_suppkey"), supplier, "s_suppkey", n_salt=4
    ).select("l_orderkey", "s_name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
