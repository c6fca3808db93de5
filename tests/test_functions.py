"""Unit tests for the T-SQL-semantics scalar layer (SURVEY §2.8, §7.4)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_loading_scripts_spark.functions import tsql


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_null_if_blank(spark):
    df = spark.createDataFrame(
        [("x",), ("",), ("  ",), (None,), (" y ",)], ["s"]
    ).select(tsql.null_if_blank("s").alias("v"))
    assert [r["v"] for r in df.collect()] == ["x", None, None, None, "y"]


def test_concat_nullsafe_vs_plus(spark):
    # T-SQL CONCAT: NULL -> '' (S1:7); '+' propagates NULL (P-PAT:98)
    df = spark.createDataFrame([("a", None, "c")], "x string, y string, z string")
    row = df.select(
        tsql.concat_nullsafe("x", "y", "z").alias("safe"),
        tsql.concat_plus("x", "y", "z").alias("plus"),
    ).collect()[0]
    assert row["safe"] == "ac"
    assert row["plus"] is None


def test_zero_pad_last(spark):
    df = spark.createDataFrame([("7",), ("123456",), (None,)], ["cc"])
    vals = [r["v"] for r in df.select(tsql.zero_pad_last("cc").alias("v")).collect()]
    assert vals == ["0007", "3456", None]


def test_clean_chain_order_matters(spark):
    # nested REPLACE applies inner-to-outer: our fold applies in list order
    col = tsql.clean_chain(F.lit('A/"B"-TERMED  C'), tsql.BILLING_GROUP_CLEANUPS)
    assert _one(spark, F.trim(col)) == "A B C"


def test_simhash_normalizes_case_space_null(spark):
    # collation shim (R4): '  Foo ' and 'FOO' must fingerprint identically;
    # NULL behaves as '' (R1)
    a = tsql.simhash_fingerprint([F.lit("  Foo "), F.lit(None)])
    b = tsql.simhash_fingerprint([F.lit("FOO"), F.lit("")])
    row = spark.range(1).select(a.alias("a"), b.alias("b")).collect()[0]
    assert row["a"] == row["b"]
    assert len(row["a"]) == 32  # md5 hex


def test_datekey_roundtrip(spark):
    d = datetime.date(2025, 2, 28)
    df = spark.createDataFrame([(d,)], ["d"])
    row = df.select(
        tsql.datekey("d").alias("dk"),
        tsql.datekey_to_date(tsql.datekey("d")).alias("back"),
    ).collect()[0]
    assert row["dk"] == 20250228
    assert row["back"] == d


def test_month_window_previous_month(spark):
    # S2:14-18: anchor 2025-03-15 -> window [2025-02-01, 2025-02-28]
    anchor = F.lit(datetime.date(2025, 3, 15))
    lo, hi = tsql.month_window(anchor)
    row = spark.range(1).select(lo.alias("lo"), hi.alias("hi")).collect()[0]
    assert row["lo"] == datetime.date(2025, 2, 1)
    assert row["hi"] == datetime.date(2025, 2, 28)


def test_eomonth_offset(spark):
    # PS:74-75: EOMONTH(d,-1)
    anchor = F.lit(datetime.date(2025, 3, 15))
    assert _one(spark, tsql.eomonth(anchor, -1)) == datetime.date(2025, 2, 28)


def test_is_date(spark):
    df = spark.createDataFrame([("2024-01-05",), ("not a date",), (None,)], ["s"])
    vals = [r["v"] for r in df.select(tsql.is_date("s").alias("v")).collect()]
    assert vals == [True, False, False]


def test_sql_udf_family_matches_python_api(spark, sf_dir):
    """Every SQL-surface tsql_* function is bit-identical to its
    functions/tsql.py twin over the real customer table."""
    from etl_loading_scripts_spark.catalog import load_table
    from etl_loading_scripts_spark.functions import tsql
    from etl_loading_scripts_spark.functions.sql_udfs import (
        register_tsql_sql_functions,
    )
    from pyspark.sql import functions as F

    register_tsql_sql_functions(spark)
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("v_cust_parity")

    sql_side = spark.sql(
        """
        SELECT c_custkey,
               tsql_norm_name(c_name) AS norm,
               tsql_zero_pad4(c_custkey % 10000) AS pad,
               tsql_hashbytes(tsql_norm_name(c_name)) AS fp,
               tsql_null_if_blank(c_mktsegment) AS seg,
               tsql_isnull(NULL, c_mktsegment) AS segd,
               tsql_money(c_acctbal) AS bal
        FROM v_cust_parity
        """
    )
    py_side = cust.select(
        "c_custkey",
        tsql.norm_name("c_name").alias("norm"),
        tsql.zero_pad_last(F.col("c_custkey") % 10000).alias("pad"),
        F.md5(tsql.norm_name("c_name")).alias("fp"),
        tsql.null_if_blank("c_mktsegment").alias("seg"),
        F.coalesce(F.lit(None), F.col("c_mktsegment")).alias("segd"),
        F.col("c_acctbal").cast("decimal(18,4)").alias("bal"),
    )
    assert sql_side.exceptAll(py_side).count() == 0
    assert py_side.exceptAll(sql_side).count() == 0
