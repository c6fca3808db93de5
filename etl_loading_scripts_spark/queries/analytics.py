"""SURVEY §2.4-2.7 — aggregations, window functions, sorts, set operations.

Money aggregates follow the exact-decimal discipline of ``registry``:
DECIMAL(18,4) inside the aggregate, DOUBLE at the boundary, so the value
hash is bit-identical to the DuckDB oracle regardless of partition order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.plancheck import broadcast_scalar, literal_table
from etl_loading_scripts_spark.functions import tsql
from etl_loading_scripts_spark.operators import (
    allocate_surrogate_keys,
    allocate_surrogate_keys_partitioned,
    global_ntile,
    top1_per_group,
)
from etl_loading_scripts_spark.registry import register

DEC = "decimal(18,4)"


# ---------------------------------------------------------------------------
# O33/O14/O12 — GROUP BY + SUM/COUNT/MIN/MAX over a datekey window
# ---------------------------------------------------------------------------


@register(
    "pricing_summary_window",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="O33/O14 PS:129-136 + S2:35: additive measures grouped inside the "
    "reference's datekey window (the monthly increment guard).",
)
def pricing_summary_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference guards with ``DateKey BETWEEN 19980101 AND 19981231``
    (an int derived from the date); expressed here as the equivalent
    *sargable* range on the raw column so the predicate reaches the parquet
    scan (``PushedFilters: [GreaterThanOrEqual(l_shipdate,...)]`` → row-group
    and partition pruning). A ``date_format(...)`` BETWEEN computes the same
    rows but scans everything — the single biggest incremental-load win at
    100 TB (SURVEY §4 'incremental windows').

    One partial+final hash aggregate after the pruned scan; grouping keys
    have ~6 values → tiny shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    window = tsql.datekey_to_date(F.lit(19980101))
    return (
        li.filter(
            (F.col("l_shipdate") >= window)
            & (F.col("l_shipdate") < F.add_months(window, 12))
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("sum_disc_price"),
            (
                F.sum(F.col("l_discount").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "count_distinct_clients",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_clients,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    doc="O34 S1:79 / PS:420: COUNT(DISTINCT client) per group.",
)
def count_distinct_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_clients"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "conditional_agg_ratio",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
           CAST(SUM(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END) AS DOUBLE) * 1.0
               / COUNT(*) AS pct_high_value
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="O36 PS:421-422: SUM(CAST(flag AS int)) + *1.0/COUNT(*) ratio idiom "
    "(the reference's %HVD metric).",
)
def conditional_agg_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    hv = F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(hv).alias("n_high_value"),
            (F.sum(hv).cast("double") * 1.0 / F.count(F.lit(1))).alias("pct_high_value"),
        )
    )


@register(
    "having_all_rows_match",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part
    GROUP BY p_brand
    HAVING COUNT(CASE WHEN p_size < 40 THEN 1 END) = COUNT(*)
    """,
    doc="O37 CT:199-203: HAVING COUNT(CASE…) = COUNT(*) — groups where "
    "every row satisfies the predicate (the all-N/A-brand report).",
)
def having_all_rows_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count(F.when(F.col("p_size") < 40, 1)).alias("n_small"),
        )
        .filter(F.col("n_small") == F.col("n_parts"))
        .select("p_brand", "n_parts")
    )


@register(
    "scalar_subquery_max_datekey",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS max_datekey,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE CAST(strftime(o_orderdate, '%Y%m%d') AS INT) =
          (SELECT MAX(CAST(strftime(o_orderdate, '%Y%m%d') AS INT)) FROM orders)
    GROUP BY 1
    """,
    doc="O38 S4:9,55,65: scalar aggregate subquery (MAX key/date) fed into "
    "the next statement — a driver-side scalar in Spark (DECLARE @x idiom).",
)
def scalar_subquery_max_datekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one place the engine collects to the driver: a single MAX row
    (same as the reference's DECLARE @maxdate). Never grows with data."""
    orders = load_table(spark, sf_dir, "orders")
    dk = tsql.datekey("o_orderdate")
    max_dk = orders.agg(F.max(dk)).collect()[0][0]
    return (
        orders.filter(dk == max_dk)
        .groupBy(dk.alias("max_datekey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "multi_grain_spend_ratio",
    oracle="""
    WITH nation_spend AS (
        SELECT c.c_nationkey, n.n_name, n.n_regionkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS nspend
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2, 3
    ),
    region_spend AS (
        SELECT n_regionkey, SUM(nspend) AS rspend
        FROM nation_spend GROUP BY 1
    )
    SELECT ns.n_name, r.r_name,
           CAST(ns.nspend AS DOUBLE) AS nation_spend,
           CAST(rs.rspend AS DOUBLE) AS region_spend,
           CAST(ns.nspend AS DOUBLE) / CAST(rs.rspend AS DOUBLE) AS spend_ratio
    FROM nation_spend ns
    JOIN region_spend rs ON ns.n_regionkey = rs.n_regionkey
    JOIN region r ON ns.n_regionkey = r.r_regionkey
    """,
    doc="O39 PS:144-182: aggregate at fine grain, re-aggregate at coarse "
    "grain, ratio of the two (TerritorySpend/TotalSpend cascade).",
)
def multi_grain_spend_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the re-aggregation reuses the first shuffle's output (25
    nations) — the second groupBy is trivially small. The ratio join
    broadcasts. Exactly how PS's CTE cascade should run distributed."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation_spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_nationkey", "n_name", "n_regionkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("nspend"))
    )
    region_spend = nation_spend.groupBy("n_regionkey").agg(F.sum("nspend").alias("rspend"))
    return (
        nation_spend.join(region_spend, "n_regionkey")
        .join(F.broadcast(region), nation_spend.n_regionkey == region.r_regionkey)
        .select(
            "n_name",
            "r_name",
            F.col("nspend").cast("double").alias("nation_spend"),
            F.col("rspend").cast("double").alias("region_spend"),
            (F.col("nspend").cast("double") / F.col("rspend").cast("double")).alias(
                "spend_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# O41-O45 — window ranking family
# ---------------------------------------------------------------------------


@register(
    "window_dedup_latest",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_datekey
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    doc="O41 S4:23,30 / P-RES:243,295: ROW_NUMBER()=1 latest-row-per-key "
    "dedup — the reference's dedup-before-merge discipline.",
)
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    latest = top1_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )
    return latest.select(
        "o_custkey", "o_orderkey", tsql.datekey("o_orderdate").alias("order_datekey")
    )


@register(
    "topk_per_group",
    oracle="""
    WITH revenue AS (
        SELECT p.p_brand, l.l_partkey,
               SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    )
    SELECT p_brand, l_partkey, CAST(rev AS DOUBLE) AS revenue, rnk
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY p_brand ORDER BY rev DESC, l_partkey
        ) AS INT) AS rnk
        FROM revenue
    ) WHERE rnk <= 10
    """,
    doc="O42 PS:391-399: top-10 per group (MMRank<=10), ranked on an exact "
    "decimal aggregate with unique-key tie-break.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias(
                "rev"
            )
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("rev").desc(), F.col("l_partkey"))
    return (
        revenue.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("p_brand", "l_partkey", F.col("rev").cast("double").alias("revenue"), "rnk")
    )


@register(
    "rank_preference_case",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l.l_partkey, s.s_suppkey, s.s_name, s.s_nationkey
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    ranked AS (
        SELECT l_partkey, s_suppkey,
               RANK() OVER (
                   PARTITION BY l_partkey
                   ORDER BY CASE WHEN s_nationkey < 5 THEN 1
                                 WHEN s_nationkey < 15 THEN 2
                                 ELSE 3 END,
                            s_suppkey
               ) AS match_rank
        FROM pairs
    )
    SELECT l_partkey, s_suppkey FROM ranked WHERE match_rank = 1
    """,
    doc="O43 P-RES:30-47,65-66: RANK() ordered by a CASE quality score, "
    "then DELETE ranking<>1 — preference-order pick per key.",
)
def rank_preference_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    pairs = (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .select("l_partkey", "s_suppkey", "s_name", "s_nationkey")
        .distinct()
    )
    quality = (
        F.when(F.col("s_nationkey") < 5, 1).when(F.col("s_nationkey") < 15, 2).otherwise(3)
    )
    ranked = top1_per_group(
        pairs, ["l_partkey"], [quality, F.col("s_suppkey")], rank_fn=F.rank
    )
    return ranked.select("l_partkey", "s_suppkey")


@register(
    "surrogate_key_allocation",
    oracle="""
    WITH existing AS (
        SELECT p_brand,
               ROW_NUMBER() OVER (ORDER BY p_brand) AS bg_key
        FROM (SELECT DISTINCT p_brand FROM part WHERE p_size > 25)
    ),
    new_brands AS (
        SELECT DISTINCT p.p_brand FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.p_brand = p.p_brand)
    ),
    allocated AS (
        SELECT p_brand,
               (SELECT MAX(bg_key) FROM existing) +
               ROW_NUMBER() OVER (ORDER BY p_brand) AS bg_key
        FROM new_brands
    )
    SELECT p_brand, CAST(bg_key AS BIGINT) AS bg_key FROM existing
    UNION ALL
    SELECT p_brand, CAST(bg_key AS BIGINT) AS bg_key FROM allocated
    """,
    doc="O44 S4:64-73: surrogate keys = MAX(existing)+ROW_NUMBER() ordered "
    "by the natural key — deterministic across retries (SURVEY §4.4).",
)
def surrogate_key_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.orderBy("p_brand")
    existing = (
        part.filter(F.col("p_size") > 25)
        .select("p_brand")
        .distinct()
        .withColumn("bg_key", F.row_number().over(w).cast("long"))
    )
    new_brands = (
        part.select("p_brand").distinct().join(existing.select("p_brand"), "p_brand", "left_anti")
    )
    allocated = allocate_surrogate_keys(
        new_brands.withColumn("bg_key", F.lit(None).cast("long")),
        existing,
        "bg_key",
        order_by=["p_brand"],
    )
    return existing.unionByName(allocated.select("p_brand", "bg_key"))


@register(
    "surrogate_key_allocation_partitioned",
    oracle="""
    WITH existing AS (
        SELECT o_orderkey, CAST(o_orderkey AS BIGINT) AS sk
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    new_rows AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey % 3 <> 0
    ),
    allocated AS (
        SELECT o_orderkey,
               (SELECT MAX(sk) FROM existing) +
               ROW_NUMBER() OVER (ORDER BY o_orderkey) AS sk
        FROM new_rows
    )
    SELECT o_orderkey, CAST(sk AS BIGINT) AS sk FROM existing
    UNION ALL
    SELECT o_orderkey, CAST(sk AS BIGINT) AS sk FROM allocated
    """,
    doc="O44 S4:64-73 at fact scale: the per-partition-offset surrogate "
    "allocator — range-repartition on the natural key, per-partition "
    "counts → cumulative offsets, row_number within partitions. Identical "
    "keys to the global-window idiom, no single-task sort (VERDICT r1 "
    "item 3).",
)
def surrogate_key_allocation_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The existing keys are the natural keys themselves (no window needed
    to build the fixture), so the only ranking in the plan is the
    operator's own partition-local row_number — the plan test asserts no
    unpartitioned window survives."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    existing = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "sk", F.col("o_orderkey").cast("long")
    )
    new_rows = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "sk", F.lit(None).cast("long")
    )
    allocated = allocate_surrogate_keys_partitioned(
        new_rows, existing, "sk", order_by=["o_orderkey"]
    )
    return existing.unionByName(allocated)


@register(
    "modal_value_per_group",
    oracle="""
    WITH counted AS (
        SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM part GROUP BY 1, 2
    )
    SELECT p_brand, p_type AS modal_type, n
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY p_brand ORDER BY n DESC, p_type
        ) AS rn FROM counted
    ) WHERE rn = 1
    """,
    doc="O45 CT:33-45: modal (most frequent) value per group — ROW_NUMBER "
    "ordered by COUNT(*) DESC (the cuisine-imputation pattern).",
)
def modal_value_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    counted = part.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("n"))
    modal = top1_per_group(counted, ["p_brand"], [F.col("n").desc(), F.col("p_type")])
    return modal.select("p_brand", F.col("p_type").alias("modal_type"), "n")


# ---------------------------------------------------------------------------
# O46/O47 — sort + top-n; O14 date function family
# ---------------------------------------------------------------------------


@register(
    "top_n_inspection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 1000
    """,
    doc="O46/O47 S3:46,92: SELECT TOP n ORDER BY — global top-k with "
    "deterministic tie-break.",
)
def top_n_inspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: Spark's sort+limit runs as TakeOrderedAndProject — each
    partition keeps its local top-1000, only 1000×P rows reach the driver-
    side merge, never a full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(1000)
    )


@register(
    "sql_view_shipping_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(strftime(date_trunc('month', l.l_shipdate), '%Y%m%d') AS INT) AS ship_month,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY 1, 2
    """,
    doc="O8/O1 PS:243-296: the view-for-BI surface exercised through the "
    "SQL API — temp views + spark.sql produce the same Catalyst plan as "
    "the DataFrame API.",
)
def sql_view_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door: register views (CREATE VIEW ≙
    createOrReplaceTempView), run declarative SQL, same optimizer."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               CAST(date_format(trunc(l.l_shipdate, 'month'), 'yyyyMMdd') AS INT) AS ship_month,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(DISTINCT l.l_orderkey) AS n_orders
        FROM v_lineitem l JOIN v_orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus <> 'F'
        GROUP BY 1, 2
        """
    )


@register(
    "datekey_month_rollup",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(strftime(date_trunc('month', o_orderdate), '%Y%m%d') AS INT) AS month_datekey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    """,
    doc="§2.8 date family S1:46-47, S2:14-18: month-floor, EOMONTH, integer "
    "datekey — the reference's monthly batch window arithmetic.",
)
def datekey_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # dates presented as ISO strings: DATE columns round-trip differently
    # through pandas/Arrow in Spark vs DuckDB (date vs datetime64) — strings
    # make the driver's value-hash representation-proof.
    return (
        orders.groupBy(
            F.date_format(tsql.month_floor("o_orderdate"), "yyyy-MM-dd").alias("month_start"),
            F.date_format(tsql.eomonth("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            tsql.datekey(tsql.month_floor("o_orderdate")).alias("month_datekey"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-grain in ONE pass — ROLLUP / CUBE (beyond the reference: SURVEY §2.4
# notes "no grouping sets/cube/rollup"; the reference computes its three
# grains with three scans + joins (PS:144-182) — this is the one-scan form)
# ---------------------------------------------------------------------------


@register(
    "rollup_spend_nation_month",
    oracle="""
    SELECT COALESCE(n.n_name, 'ALL') AS nation,
           COALESCE(CAST(strftime(date_trunc('month', o.o_orderdate), '%Y%m') AS INT), -1)
               AS order_month,
           CAST(GROUPING(n.n_name, date_trunc('month', o.o_orderdate)) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(n.n_name, date_trunc('month', o.o_orderdate))
    """,
    doc="ROLLUP: nation→month hierarchy totals in one scan — replaces the "
    "reference's re-aggregate-at-each-grain pattern (O39, PS:144-182) with "
    "a single partial-aggregatable pass.",
)
def rollup_spend_nation_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle produces all three grains (nation×month, nation, grand
    total). At 100 TB this beats N separate aggregations: the expand adds
    rows map-side but every grain shares one exchange, and the two dim
    joins are broadcasts (customer/nation ≪ orders)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            tsql.month_floor("o_orderdate").alias("om"),
            "o_totalprice",
        )
    )
    return (
        joined.rollup("n_name", "om")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spend"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce(F.date_format("om", "yyyyMM").cast("int"), F.lit(-1)).alias(
                "order_month"
            ),
            F.col("gid").cast("long").alias("gid"),
            "n_orders",
            "total_spend",
        )
    )


@register(
    "cube_priority_status",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """,
    doc="CUBE: all four grouping sets of (priority, status) in one scan — "
    "the cross-grain BI rollup surface the reference serves with views "
    "(PS:243-296).",
)
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expand factor = 4 grouping sets, but key cardinality is tiny (5×3)
    so partial aggregation collapses map-side — the shuffle carries only
    ~4×15 rows per task regardless of input scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spend"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.col("gid").cast("long").alias("gid"),
            "n_orders",
            "total_spend",
        )
    )


# ---------------------------------------------------------------------------
# Distribution analytics beyond the reference's ranking-only windows:
# exact percentiles, NTILE bucketing, lag-based deltas, sketch counts
# ---------------------------------------------------------------------------


@register(
    "percentile_price_profile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.9) AS p90,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1
    """,
    doc="Exact interpolated percentiles (p50/p90/p99) per return flag — "
    "Spark percentile() and DuckDB quantile_cont share the linear-"
    "interpolation definition, bit-identical on the same doubles.",
)
def percentile_price_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale note: exact percentile sorts within each group (memory ∝
    group size). At 100 TB swap percentile() → percentile_approx() (t-digest,
    mergeable, bounded memory) and drop the oracle to a tolerance test —
    the sketch path is exercised by approx_distinct_clients."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "percentile_price_profile_approx",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50_exact,
           quantile_cont(l_extendedprice, 0.9) AS p90_exact,
           quantile_cont(l_extendedprice, 0.99) AS p99_exact,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(1 AS BIGINT) AS approx_within_2pct
    FROM lineitem GROUP BY 1
    """,
    doc="percentile_approx (Greenwald-Khanna sketch: mergeable, bounded "
    "memory) — the 100 TB replacement for the exact per-group sort. "
    "Sketch values are engine-specific, so the checkable output is the "
    "deterministic invariant |approx-exact|/exact <= 2% per quantile "
    "(VERDICT r1 item 5, same technique as approx_distinct_clients).",
)
def percentile_price_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """accuracy=10000 bounds rank error at n/10000; on the smooth price
    distribution that lands well inside 2% relative value error. The exact
    percentiles ride along only to make the invariant checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_exact"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99_exact"),
        F.expr(
            "percentile_approx(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)"
        ).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )

    def within(exact: str, approx) -> Column:
        return F.abs(approx - F.col(exact)) / F.col(exact) <= F.lit(0.02)

    ok = (
        within("p50_exact", F.col("ap")[0])
        & within("p90_exact", F.col("ap")[1])
        & within("p99_exact", F.col("ap")[2])
    )
    return agg.select(
        "l_returnflag",
        "p50_exact",
        "p90_exact",
        "p99_exact",
        "n",
        ok.cast("bigint").alias("approx_within_2pct"),
    )


@register(
    "spend_deciles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY 1
    )
    SELECT o_custkey, total_spend,
           CAST(NTILE(10) OVER (ORDER BY total_spend DESC, o_custkey) AS INT) AS decile
    FROM spend
    """,
    doc="NTILE(10) spend deciles over per-customer totals — the "
    "segmentation cut the reference approximates with ratio thresholds "
    "(PS:188-208), as an equal-frequency bucketing. Executed through the "
    "range-bucket global rank (operators/ranks.py), not a global window.",
)
def spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT NTILE semantics at any scale (VERDICT r1 item 6): the naive
    ``NTILE(10) OVER (ORDER BY …)`` is a single-partition sort over every
    customer; ``global_ntile`` derives the identical tile arithmetically
    from a range-partitioned global rank — the oracle stays the plain SQL
    NTILE and still hash-matches. DESC spend is expressed as an ascending
    negated column (exact for doubles)."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spend")
    )
    tiled = global_ntile(
        spend.withColumn("__neg_spend__", -F.col("total_spend")),
        10,
        ["__neg_spend__", "o_custkey"],
        tile_col="decile",
    )
    return tiled.select("o_custkey", "total_spend", "decile")


@register(
    "month_over_month_growth",
    oracle="""
    WITH monthly AS (
        SELECT CAST(strftime(date_trunc('month', o_orderdate), '%Y%m') AS INT) AS ym,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT ym, revenue,
           lag(revenue) OVER (ORDER BY ym) AS prev_revenue,
           revenue - lag(revenue) OVER (ORDER BY ym) AS delta,
           CASE WHEN lag(revenue) OVER (ORDER BY ym) IS NULL THEN NULL
                ELSE (revenue - lag(revenue) OVER (ORDER BY ym))
                     / lag(revenue) OVER (ORDER BY ym) END AS mom_ratio
    FROM monthly
    """,
    doc="Month-over-month revenue deltas via lag() — the BI trend surface "
    "one step beyond the reference's per-month snapshots (PS:243-296).",
)
def month_over_month_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window input is ≤ one row per month (pre-aggregated) — the
    unpartitioned lag sort is over ~100 rows regardless of fact scale;
    the heavy lifting stays in the partial-aggregatable monthly groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(tsql.month_floor("o_orderdate"), "yyyyMM").cast("int").alias("ym")
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"))
    w = Window.orderBy("ym")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "ym",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") - prev).alias("delta"),
        F.when(prev.isNull(), F.lit(None)).otherwise(
            (F.col("revenue") - prev) / prev
        ).alias("mom_ratio"),
    )


@register(
    "approx_distinct_clients",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_clients,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(1 AS BIGINT) AS within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="approx_count_distinct (HyperLogLog++) distinct patrons per order "
    "priority — the mergeable-sketch path that replaces exact "
    "COUNT(DISTINCT) shuffles at 100 TB. HLL register values are "
    "engine-specific, so the checkable output is the deterministic "
    "invariant |approx-exact|/exact <= 5% (within_5pct = 1) alongside the "
    "exact counts; the oracle computes the same groups with within_5pct "
    "constant-true.",
)
def approx_distinct_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT k) re-shuffles per distinct combination; the
    HLL sketch is a fixed ~1.5 KB register set per group, merged
    map-side — the difference between one pass and two at fact scale.

    The exact COUNT(DISTINCT) here exists only to make the sketch's
    accuracy a hash-checkable invariant (rsd=0.02 ⇒ well inside 5%); a
    production run would emit the sketch estimate alone."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_clients"),
        F.countDistinct("o_custkey").alias("exact_clients"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.select(
        "o_orderpriority",
        "exact_clients",
        "n_orders",
        (
            F.abs(F.col("approx_clients") - F.col("exact_clients"))
            / F.col("exact_clients")
            <= F.lit(0.05)
        )
        .cast("bigint")
        .alias("within_5pct"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_f
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="PIVOT: status columns per priority row — the cross-tab shape the "
    "reference's BI views flatten manually; Spark's pivot() with an "
    "EXPLICIT value list (omit it and Spark runs a blocking distinct scan "
    "to discover values).",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot() compiles to the same conditional-aggregate plan as the
    oracle's CASE columns — one partial+final aggregate, no extra shuffle
    vs a plain groupBy. Always pass the value list at scale."""
    orders = load_table(spark, sf_dir, "orders")
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("rev"),
        )
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).alias("n_f"),
        F.coalesce("O_n", F.lit(0)).alias("n_o"),
        F.coalesce("P_n", F.lit(0)).alias("n_p"),
        F.col("F_rev").alias("rev_f"),
    )


@register(
    "set_ops_customer_cohorts",
    oracle="""
    WITH urgent AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    finished AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ),
    both_c AS (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM finished),
    only_urgent AS (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM finished)
    SELECT 'both' AS cohort, CAST(COUNT(*) AS BIGINT) AS n FROM both_c
    UNION ALL
    SELECT 'only_urgent', CAST(COUNT(*) AS BIGINT) FROM only_urgent
    """,
    doc="INTERSECT / EXCEPT cohort algebra (beyond the reference, which "
    "uses only UNION ALL — SURVEY §2.7) — Catalyst plans both as "
    "semi/anti hash joins, not sorts.",
)
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully declarative (no driver-side counts): each cohort aggregates
    to one labeled row, unioned — one job, plans as semi/anti joins."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    both_c = urgent.intersect(finished).agg(
        F.lit("both").alias("cohort"), F.count(F.lit(1)).alias("n")
    )
    only_c = urgent.exceptAll(finished).agg(
        F.lit("only_urgent").alias("cohort"), F.count(F.lit(1)).alias("n")
    )
    return both_c.unionByName(only_c)


@register(
    "heavy_hitter_users",
    oracle="""
    WITH total AS (SELECT COUNT(*) AS t FROM events),
    counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    SELECT c.user_id, c.n_events,
           CAST(c.n_events AS DOUBLE) / t.t AS share
    FROM counts c, total t
    WHERE c.n_events * 300 > t.t
    """,
    doc="Exact heavy hitters: users holding > 1/300 of all events "
    "(count*k > total avoids float thresholds) — the skew-detection "
    "primitive behind salting decisions.",
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one aggregate + a broadcast 1-row total; the integer
    cross-multiplied threshold keeps the filter exact. The sketch
    equivalent (Misra-Gries / count-min) replaces the exact groupBy when
    even the per-key count table is too big — not needed below ~10⁹ keys."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = events.agg(F.count(F.lit(1)).alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_events") * 300 > F.col("t"))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("t")).alias("share"),
        )
    )


MG_K = 300  # Misra-Gries counters per partition == the 1/k HH threshold


def _mg_sketch_batches(batches):
    """Per-partition Misra-Gries summary with ``MG_K`` counters.

    Each Arrow batch's exact value_counts are merged into the running
    summary; when the summary exceeds K entries, every counter is
    decremented by the (K+1)-th largest value and non-positive entries
    drop (the mergeable-summaries formulation — error stays ≤ n_p/(K+1)).
    Emits at most K ``(user_id, lb)`` rows per partition, where ``lb`` is
    the surviving lower-bound count."""
    import pandas as pd

    counters: dict = {}
    for pdf in batches:
        for uid, c in pdf["user_id"].value_counts().items():
            counters[uid] = counters.get(uid, 0) + int(c)
        if len(counters) > MG_K:
            dec = sorted(counters.values(), reverse=True)[MG_K]
            counters = {u: c - dec for u, c in counters.items() if c > dec}
    yield pd.DataFrame(
        {"user_id": list(counters.keys()), "lb": list(counters.values())}
    )


@register(
    "heavy_hitter_mg_sketch",
    oracle="""
    WITH total AS (SELECT COUNT(*) AS t FROM events),
    counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    SELECT c.user_id, c.n_events,
           CAST(c.n_events AS DOUBLE) / t.t AS share
    FROM counts c, total t
    WHERE c.n_events * 300 > t.t
    """,
    doc="Misra-Gries sketch + exact-verify heavy hitters: per-partition "
    "K-counter summaries (Arrow-batched) nominate a bounded candidate "
    "set; only candidates are exactly counted. Same answer as the exact "
    "twin (the MG guarantee makes candidates a superset of true "
    "> 1/K hitters), so the oracle is the exact-frequency SQL.",
)
def heavy_hitter_mg_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for when even the per-key count table is too big
    (≥10⁹ keys): the full groupBy in :func:`heavy_hitter_users` is
    replaced by ≤ K rows per partition, then an exact count restricted to
    the ≤ K·P candidates via a broadcast semi-join.

    Determinism: the CANDIDATE set depends on partitioning, but the
    output doesn't — MG guarantees every user with freq > n/K survives
    some partition's summary (if it were light in every partition it
    would be light globally), and the verify phase keeps only exact
    threshold-passers. Two scans of events, no full-width shuffle."""
    events = load_table(spark, sf_dir, "events")
    sketch = events.select("user_id").mapInPandas(
        _mg_sketch_batches, schema="user_id long, lb long"
    )
    cands = sketch.select("user_id").distinct()
    counts = (
        events.join(F.broadcast(cands), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    total = events.agg(F.count(F.lit(1)).alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_events") * MG_K > F.col("t"))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("t")).alias("share"),
        )
    )


HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 500000.0, 20


@register(
    "price_histogram",
    oracle=f"""
    SELECT CAST(least({HIST_BUCKETS - 1},
                      greatest(0, CAST(floor((o_totalprice - {HIST_LO})
                          / (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS})) AS INT))) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS bucket_revenue
    FROM orders
    GROUP BY 1
    """,
    doc=f"Equi-width histogram: {HIST_BUCKETS} buckets over order price via "
    "clamped floor arithmetic (identical in both engines; DuckDB 1.0 has "
    "no width_bucket) — the profiling pass that sizes skew/salting.",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    step = (HIST_HI - HIST_LO) / HIST_BUCKETS
    bucket = F.least(
        F.lit(HIST_BUCKETS - 1),
        F.greatest(F.lit(0), F.floor((F.col("o_totalprice") - HIST_LO) / step).cast("int")),
    ).cast("int")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("bucket_revenue"),
    )


@register(
    "correlated_scalar_subquery",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS price,
           CAST((SELECT MAX(o2.o_totalprice) FROM orders o2
                 WHERE o2.o_custkey = o.o_custkey) AS DOUBLE) AS cust_max_price,
           o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                             WHERE o2.o_custkey = o.o_custkey) AS is_cust_max
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
    """,
    doc="Correlated scalar subquery (per-row 'max over my customer') — "
    "Catalyst decorrelates it into ONE aggregate + join, not a per-row "
    "probe; the T-SQL idiom behind the reference's MAX() lookups (O38) "
    "generalized to row scope.",
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expressed through the SQL front door because correlation is a SQL
    construct; RewriteCorrelatedScalarSubquery turns it into
    groupBy(custkey).max join — verify with tools/explain_plan.py: no
    nested-loop, one aggregate subtree. A naive engine executes |rows|
    subqueries; the decorrelated plan is two scans regardless of row
    count."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_css")
    return spark.sql(
        """
        SELECT o.o_orderkey,
               CAST(o.o_totalprice AS DOUBLE) AS price,
               CAST((SELECT MAX(o2.o_totalprice) FROM v_orders_css o2
                     WHERE o2.o_custkey = o.o_custkey) AS DOUBLE) AS cust_max_price,
               o.o_totalprice = (SELECT MAX(o2.o_totalprice) FROM v_orders_css o2
                                 WHERE o2.o_custkey = o.o_custkey) AS is_cust_max
        FROM v_orders_css o
        WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
        """
    )


SALT_N = 8


@register(
    "salted_join_skew_guard",
    oracle="""
    SELECT s.s_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey
    """,
    doc=f"Skew-guard join: the supplier side is replicated across {SALT_N} "
    "salts and the fact picks a deterministic salt, so one hot supplier "
    "key spreads over N tasks instead of stalling one straggler. The "
    "salt is engine-internal (it cancels in the aggregate), so the "
    "oracle is the plain join.",
)
def salted_join_skew_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit key salting — the manual fallback when AQE's skew-join
    split can't help (e.g. the skew is in a single key of a shuffle
    HASH join, or the join feeds a window that re-skews). The dim side
    explodes ×N (bounded replication of the SMALL side only), the fact
    side computes salt = hash(row) % N in the scan projection, and the
    join key becomes (key, salt) — at 100 TB a 10⁹-row hot key becomes
    N co-running partitions. The shuffle_hash hint keeps the
    demonstration honest (broadcast would hide the salting)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    dim_salted = supplier.select(
        "s_suppkey",
        F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1))).alias("__salt__"),
    )
    fact_salted = lineitem.select(
        "l_suppkey",
        "l_extendedprice",
        "l_discount",
        F.pmod(F.xxhash64("l_orderkey"), F.lit(SALT_N)).cast("int").alias("__salt__"),
    )
    return (
        fact_salted.join(
            dim_salted.hint("shuffle_hash"),
            (fact_salted.l_suppkey == dim_salted.s_suppkey)
            & (fact_salted.__salt__ == dim_salted.__salt__),
        )
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_txns"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue"),
        )
    )


GF_ANCHOR, GF_MONTHS = "1995-01-01", 80  # orders span 1995-01 .. 2001-08


@register(
    "gap_fill_monthly_revenue",
    oracle=f"""
    WITH spine AS (
        SELECT n.n_nationkey, n.n_name,
               CAST(strftime(DATE '{GF_ANCHOR}' + (m.n * INTERVAL '1 month'),
                             '%Y%m') AS INT) AS ym
        FROM nation n, LATERAL unnest(generate_series(0, {GF_MONTHS - 1})) AS m(n)
    ),
    monthly AS (
        SELECT c_nationkey, CAST(strftime(o_orderdate, '%Y%m') AS INT) AS ym,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    )
    SELECT s.n_name, s.ym, m.revenue,
           last_value(m.revenue IGNORE NULLS) OVER (
               PARTITION BY s.n_nationkey ORDER BY s.ym
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS revenue_ff,
           CAST(m.revenue IS NULL AS BIGINT) AS is_gap
    FROM spine s LEFT JOIN monthly m
      ON s.n_nationkey = m.c_nationkey AND s.ym = m.ym
    """,
    doc="Time-series gap fill: a generated (nation × month) spine left-"
    "joined to monthly revenue, missing months forward-filled with "
    "last-observation-carried-forward (IGNORE NULLS last_value) — the "
    "densification step BI trend lines and feature pipelines both need.",
)
def gap_fill_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the spine is dims × months (generated, tiny) → broadcast to
    the monthly aggregate; the forward fill partitions by nation so the
    window never exceeds the month count per key. The fact side is one
    groupBy; no shuffle grows with history length."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spine = nation.select(
        "n_nationkey",
        "n_name",
        F.explode(F.sequence(F.lit(0), F.lit(GF_MONTHS - 1))).alias("n"),
    ).select(
        "n_nationkey",
        "n_name",
        F.date_format(F.add_months(F.lit(GF_ANCHOR).cast("date"), F.col("n")), "yyyyMM")
        .cast("int")
        .alias("ym"),
    )
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_nationkey"),
            F.date_format("o_orderdate", "yyyyMM").cast("int").alias("ym"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"))
    )
    joined = spine.join(
        monthly,
        (spine.n_nationkey == monthly.c_nationkey) & (spine.ym == monthly.ym),
        "left",
    ).select(spine.n_nationkey, "n_name", spine.ym, "revenue")
    w = (
        Window.partitionBy("n_nationkey")
        .orderBy("ym")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "n_name",
        "ym",
        "revenue",
        F.last("revenue", ignorenulls=True).over(w).alias("revenue_ff"),
        F.col("revenue").isNull().cast("bigint").alias("is_gap"),
    )


@register(
    "grouping_sets_spend",
    oracle="""
    SELECT n.n_name,
           CAST(strftime(o.o_orderdate, '%Y%m') AS INT) AS ym,
           CAST(GROUPING(n.n_name,
                         CAST(strftime(o.o_orderdate, '%Y%m') AS INT)) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name, CAST(strftime(o.o_orderdate, '%Y%m') AS INT)),
                            (n.n_name),
                            (CAST(strftime(o.o_orderdate, '%Y%m') AS INT)))
    """,
    doc="Explicit GROUPING SETS — the nation x month detail plus BOTH "
    "one-dimension margins in a single pass, with grouping_id "
    "disambiguating real NULLs from grouped-out keys (the general form "
    "behind ROLLUP/CUBE; Spark computes all sets in one Expand + one "
    "aggregate, not three scans).",
)
def grouping_sets_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS is SQL-only in Spark (the DataFrame API stops at
    cube/rollup), so the query goes through spark.sql over temp views —
    also exercising the O8 view-definition path. Scale: one Expand node
    replicates each row once per set (3x here) before a single partial/
    final aggregate — cheaper than N scans whenever the scan dominates,
    which at 100 TB it always does."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("gs_nation")
    return spark.sql(
        """
        SELECT n_name,
               CAST(date_format(o_orderdate, 'yyyyMM') AS INT) AS ym,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        FROM gs_orders
        JOIN gs_customer ON o_custkey = c_custkey
        JOIN gs_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, CAST(date_format(o_orderdate, 'yyyyMM') AS INT)),
                                (n_name),
                                (CAST(date_format(o_orderdate, 'yyyyMM') AS INT)))
        """
    )


@register(
    "fuzzy_levenshtein_join",
    oracle="""
    WITH names AS (
        SELECT p_name, string_split(p_name, ' ')[-1] AS blk,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1, 2
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    doc="Edit-distance fuzzy join (entity matching): DISTINCT names first, "
    "block on the final token, Levenshtein <= 3 verify on in-block pairs "
    "only — never an all-pairs product, never per-row duplicate work.",
)
def fuzzy_levenshtein_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedupe-before-verify shape for fuzzy matching: the quadratic
    edit-distance verify runs on DISTINCT name pairs inside a blocking key
    (final token), so its cost follows name-vocabulary size, not table
    size — here 64 names stand in for 2000 parts. At 100 TB the same plan
    holds whenever the dirty-join column's cardinality is << row count
    (names, addresses, merchant strings — always true in practice), and
    the per-name row count rides along as a pre-aggregated weight instead
    of exploding the pair set. Spark and DuckDB both implement classic
    Levenshtein, so the integer distance is engine-portable."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("blk")
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("long")
            .alias("edit_dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


@register(
    "customer_spend_percentile",
    oracle="""
    WITH spend AS (
        SELECT c_custkey, c_nationkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_nationkey
    )
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey, total_spend,
           percent_rank() OVER (PARTITION BY c_nationkey ORDER BY total_spend, c_custkey)
               AS spend_pct_rank,
           cume_dist() OVER (PARTITION BY c_nationkey ORDER BY total_spend, c_custkey)
               AS spend_cume_dist
    FROM spend
    """,
    doc="percent_rank + cume_dist distribution windows per nation over "
    "aggregated customer spend - the relative-standing surface (ties "
    "broken by custkey so both engines rank identically).",
)
def customer_spend_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one groupBy shuffle to customer grain, then a window
    partitioned by nation — both keyed, no global sort. percent_rank is
    (rank-1)/(n-1) and cume_dist is rows_leq/n, pure rational functions of
    integer ranks, so the doubles are bit-identical across engines."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_spend")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("total_spend", "c_custkey")
    return spend.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "total_spend",
        F.percent_rank().over(w).alias("spend_pct_rank"),
        F.cume_dist().over(w).alias("spend_cume_dist"),
    )


CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 256  # buckets per row (two md5 nibbles)

_NIB = "0123456789abcdef"


def _cms_bucket_duck(hexpr: str) -> str:
    return (
        f"(strpos('{_NIB}', substr({hexpr}, 1, 1)) - 1) * 16"
        f" + (strpos('{_NIB}', substr({hexpr}, 2, 1)) - 1)"
    )


@register(
    "heavy_hitter_cms_probe",
    oracle=f"""
    WITH rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
    hashed AS (
        SELECT e.user_id, r.r,
               md5('cms' || r.r || '|' || CAST(e.user_id AS VARCHAR)) AS h
        FROM events e CROSS JOIN rows_ r
    ),
    sketch AS (
        SELECT r, {_cms_bucket_duck('h')} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM hashed GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n FROM events GROUP BY 1
    ),
    probes AS (
        SELECT user_id, exact_n FROM exact ORDER BY exact_n DESC, user_id LIMIT 20
    ),
    pb AS (
        SELECT p.user_id, p.exact_n, r.r,
               {_cms_bucket_duck("md5('cms' || r.r || '|' || CAST(p.user_id AS VARCHAR))")} AS bucket
        FROM probes p CROSS JOIN rows_ r
    )
    SELECT pb.user_id, pb.exact_n, MIN(s.cnt) AS cms_est,
           MIN(s.cnt) - pb.exact_n AS overcount
    FROM pb JOIN sketch s ON s.r = pb.r AND s.bucket = pb.bucket
    GROUP BY 1, 2
    """,
    doc=f"Count-Min Sketch frequency estimates: {CMS_DEPTH}x{CMS_WIDTH} "
    "md5-bucket counters built in one groupBy, probed for the top-20 "
    "exact users; overcount >= 0 always (CMS never underestimates).",
)
def heavy_hitter_cms_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the sketch family (HLL distinct, Misra-Gries top-k, CMS
    point frequency). The sketch is the (r, bucket) count table — fixed
    depth x width cells regardless of input size, mergeable across partitions
    and days (counts add), built with one explode + one groupBy. Probing
    broadcasts the tiny sketch to the probe rows. The top-20 probe sort
    runs on user-grain aggregates (bounded), and the md5 bucketing is the
    engine-portable hash discipline used by the whole dedup family."""

    def bucket_of(hcol):
        first = F.expr(f"locate(substring({hcol}, 1, 1), '{_NIB}') - 1")
        second = F.expr(f"locate(substring({hcol}, 2, 1), '{_NIB}') - 1")
        return first * 16 + second

    events = load_table(spark, sf_dir, "events")
    rows = F.explode(F.array(*[F.lit(r) for r in range(CMS_DEPTH)])).alias("r")
    hashed = events.select("user_id").select(
        "user_id", rows
    ).select(
        "user_id",
        "r",
        F.md5(
            F.concat(F.lit("cms"), F.col("r").cast("string"), F.lit("|"),
                     F.col("user_id").cast("string"))
        ).alias("h"),
    )
    sketch = (
        hashed.select("r", bucket_of("h").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.orderBy(F.col("exact_n").desc(), "user_id").limit(20)
    pb = probes.select("user_id", "exact_n", rows).select(
        "user_id",
        "exact_n",
        "r",
        bucket_of(
            "md5(concat('cms', cast(r as string), '|', cast(user_id as string)))"
        ).alias("bucket"),
    )
    return (
        pb.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    ),
    s AS (
        SELECT 1 AS stage_idx, 'view' AS stage,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
        UNION ALL SELECT 3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM p)
    )
    SELECT a.stage_idx, a.stage, a.n_users,
           a.n_users / b.n_users AS conv_from_prev
    FROM s a LEFT JOIN s b ON b.stage_idx = a.stage_idx - 1
    """,
    doc="Ordered funnel (view -> click -> purchase): per-stage first-event "
    "times chained by strictly-later joins; output is the 3-row funnel "
    "with stage-over-stage conversion.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics funnel without sequence UDFs: stage N's entrants
    are the min-timestamp of the stage event STRICTLY AFTER the user's
    stage-N-1 time — three groupBys and two joins, all keyed on user_id
    (co-partitioned, one logical shuffle at scale). The final 3-row
    summary self-joins on stage_idx-1 for conversion — an equi-join of
    single-row aggregates, not a window over one partition."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage_min(etype, prev=None, prev_t=None):
        df = events.filter(F.col("event_type") == etype)
        if prev is not None:
            df = df.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return df.groupBy("user_id").agg(F.min("ts").alias(f"t_{etype}"))

    v = stage_min("view")
    c = stage_min("click", v, "t_view")
    p = stage_min("purchase", c, "t_click")

    def count_row(df, idx, name):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"), "n_users"
        )

    s = count_row(v, 1, "view").unionByName(count_row(c, 2, "click")).unionByName(
        count_row(p, 3, "purchase")
    )
    b = s.select(
        (F.col("stage_idx") + 1).alias("stage_idx"), F.col("n_users").alias("prev_n")
    )
    return (
        s.join(b, "stage_idx", "left")
        .select(
            "stage_idx",
            "stage",
            "n_users",
            (F.col("n_users") / F.col("prev_n")).alias("conv_from_prev"),
        )
    )


@register(
    "set_ops_customers",
    oracle="""
    WITH y95 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
    ),
    y96 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT 'both' AS cohort, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
    UNION ALL
    SELECT '1995_only', o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
    UNION ALL
    SELECT '1996_only', o_custkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
    """,
    doc="INTERSECT / EXCEPT cohort algebra: customers ordering in both "
    "1995 and 1996, one year only each - the set operators Catalyst "
    "rewrites to semi/anti joins.",
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst rewrites intersect() to a distinct left-semi join and
    exceptAll/except to a distinct left-anti join - both hash-partitioned
    equi-joins on the key, so the cohort algebra costs three keyed
    shuffles of DISTINCT custkeys (year-pruned scans feed them), not
    three scans of raw orders."""
    orders = load_table(spark, sf_dir, "orders")

    def year(y):
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year(1995), year(1996)
    tag = lambda df, name: df.select(F.lit(name).alias("cohort"), "o_custkey")  # noqa: E731
    return (
        tag(y95.intersect(y96), "both")
        .unionByName(tag(y95.exceptAll(y96).distinct(), "1995_only"))
        .unionByName(tag(y96.exceptAll(y95).distinct(), "1996_only"))
    )


@register(
    "unpivot_monthly_metrics",
    oracle="""
    WITH monthly AS (
        SELECT CAST(strftime(date_trunc('month', o_orderdate), '%Y%m%d') AS INT) AS month_datekey,
               CAST(COUNT(*) AS DOUBLE) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month_datekey, 'n_orders' AS metric, n_orders AS value FROM monthly
    UNION ALL
    SELECT month_datekey, 'revenue', revenue FROM monthly
    """,
    doc="UNPIVOT (wide metrics -> long key/value): the monthly rollup's "
    "two measures melted into (month, metric, value) rows via the native "
    "unpivot operator (Expand node, one pass - not N self-scans).",
)
def unpivot_monthly_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.unpivot compiles to a single Expand (each input row replicated
    once per measure) - the long-form melt costs one aggregate + one
    map-side Expand, no join, no re-scan. At 100 TB the input to the
    Expand is already month-grain (tiny); melting before aggregating
    would instead double the fact-scan rows - order matters."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        tsql.datekey(tsql.month_floor("o_orderdate")).alias("month_datekey")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("revenue"),
    )
    return monthly.unpivot(
        ids=["month_datekey"],
        values=["n_orders", "revenue"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "approx_distinct_monthly",
    oracle="""
    SELECT CAST(strftime(date_trunc('month', o_orderdate), '%Y%m%d') AS INT) AS month_datekey,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_nd,
           CAST(1 AS BIGINT) AS approx_within_5pct
    FROM orders GROUP BY 1
    """,
    doc="Per-month HLL distinct customers: approx_count_distinct(rsd=0.01) "
    "per month window, checked as the deterministic within-5pct invariant "
    "against the exact count (same technique as approx_distinct_clients).",
)
def approx_distinct_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed sketch shape production dashboards run: HLL registers
    are mergeable, so month-grain sketches roll up to quarters/years
    WITHOUT rescanning facts — the reason to store sketches, not counts.
    The exact count rides along only to make the invariant checkable."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy(
        tsql.datekey(tsql.month_floor("o_orderdate")).alias("month_datekey")
    ).agg(
        F.countDistinct("o_custkey").alias("exact_nd"),
        F.expr("approx_count_distinct(o_custkey, 0.01)").alias("ap"),
    )
    return agg.select(
        "month_datekey",
        "exact_nd",
        F.when(
            F.abs(F.col("ap") - F.col("exact_nd")) / F.col("exact_nd") <= 0.05, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("approx_within_5pct"),
    )


INCR_CUTOFF = "2001-08-01"  # the "new month" increment boundary


@register(
    "incremental_monthly_revenue",
    oracle="""
    SELECT CAST(strftime(date_trunc('month', o_orderdate), '%Y%m%d') AS INT) AS month_datekey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
    doc="Incremental aggregate maintenance: prior summary (months < "
    "cutoff) merged with the new month's delta via union + re-sum of "
    "exact DECIMAL measures - provably equal to the full recompute "
    "(the oracle IS the full recompute).",
)
def incremental_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(increment) summary refresh: the delta branch's scan prunes to
    the cutoff month (PushedFilters on o_orderdate), the merge shuffles
    only summary-grain rows. Measures stay DECIMAL through the merge -
    decimal addition is associative, so merged == recomputed exactly;
    merging DOUBLE sums instead would drift. In production ``prior`` is
    the stored summary table; here it is built once from the history
    months to keep the query self-contained and the equality checkable."""
    from etl_loading_scripts_spark.operators.incremental import merge_aggregates

    orders = load_table(spark, sf_dir, "orders")

    def summarize(df):
        return df.groupBy(
            tsql.datekey(tsql.month_floor("o_orderdate")).alias("month_datekey")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec"),
        )

    prior = summarize(orders.filter(F.col("o_orderdate") < F.lit(INCR_CUTOFF)))
    delta = summarize(orders.filter(F.col("o_orderdate") >= F.lit(INCR_CUTOFF)))
    merged = merge_aggregates(prior, delta, keys=["month_datekey"])
    return merged.select(
        "month_datekey",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("rev_dec").cast("double").alias("revenue"),
    )


MAD_K = 3.0 * 1.4826  # 3-sigma-equivalent cutoff for normal data


@register(
    "order_value_outliers_mad",
    oracle=f"""
    WITH med AS (
        SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
        FROM orders GROUP BY 1
    ),
    dev AS (
        SELECT o.o_orderpriority, ABS(o.o_totalprice - m.med) AS dev, m.med
        FROM orders o JOIN med m USING (o_orderpriority)
    ),
    mad AS (
        SELECT o_orderpriority, ANY_VALUE(med) AS med,
               quantile_cont(dev, 0.5) AS mad,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dev GROUP BY 1
    )
    SELECT d.o_orderpriority, m.med, m.mad, m.n,
           CAST(COUNT(*) FILTER (WHERE d.dev > {MAD_K} * m.mad) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad m USING (o_orderpriority)
    GROUP BY 1, 2, 3, 4
    """,
    doc="Robust outlier detection per group: median absolute deviation "
    f"with a {MAD_K:.4f}*MAD cutoff (the 3-sigma equivalent). Exact "
    "interpolated percentiles are bit-identical across engines, so the "
    "whole detection is hash-checkable - unlike stddev-based z-scores "
    "whose float accumulation is order-dependent.",
)
def order_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD beats z-scores at scale twice over: it is robust (one whale
    order cannot inflate the cutoff that is supposed to catch it), and it
    is deterministic (percentile sorts; SUM(double) accumulation order is
    partition-dependent). Plan: two grouped percentile passes over the
    fact with the 5-row group stats broadcast back between them - the
    fact shuffles on the group key twice, never globally."""
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.first("med").alias("med"),
        F.expr("percentile(dev, 0.5)").alias("mad"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority", "med", "mad", "n")
        .agg(
            F.sum(
                F.when(F.col("dev") > F.lit(MAD_K) * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
    )


@register(
    "rolling_7day_distinct_hll",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    ),
    day_users AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        FROM events
    )
    SELECT strftime(s.d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS exact_nd,
           CAST(1 AS BIGINT) AS hll_within_5pct
    FROM days s JOIN day_users u
      ON u.d BETWEEN s.d - INTERVAL 6 DAY AND s.d
    GROUP BY 1
    """,
    doc="Rolling 7-day distinct users from per-day mergeable HLL sketches "
    "(hll_sketch_agg + hll_union_agg): store one sketch per day, answer "
    "ANY trailing window by unioning 7 sketches - no fact rescan. Checked "
    "as the within-5pct invariant against the exact rolling distinct.",
)
def rolling_7day_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding COUNT(DISTINCT) does not decompose (windows overlap), so at
    100 TB the choices are a quadratic day x window rescan or mergeable
    sketches; this is the sketch path. Per-day sketches are fact-scan
    grain-reduced once; the trailing-window union joins day-grain rows
    only (|days| x 7, bounded regardless of event volume). The exact twin
    rides along at day_users grain purely to make the invariant checkable."""
    events = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    day_sketch = events.select(day, "user_id").groupBy("d").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    day_users = events.select(day, "user_id").distinct()
    spine = day_sketch.select(F.col("d").alias("win_d"))
    merged = (
        spine.join(
            day_sketch,
            (F.col("d") <= F.col("win_d"))
            & (F.col("d") >= F.date_sub(F.col("win_d"), 6)),
        )
        .groupBy("win_d")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("hll_nd"))
    )
    exact = (
        spine.join(
            day_users,
            (F.col("d") <= F.col("win_d"))
            & (F.col("d") >= F.date_sub(F.col("win_d"), 6)),
        )
        .groupBy("win_d")
        .agg(F.countDistinct("user_id").alias("exact_nd"))
    )
    return exact.join(merged, "win_d").select(
        F.date_format("win_d", "yyyy-MM-dd").alias("day"),
        "exact_nd",
        F.when(
            F.abs(F.col("hll_nd") - F.col("exact_nd")) / F.col("exact_nd") <= 0.05, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("hll_within_5pct"),
    )


@register(
    "price_equidepth_histogram",
    oracle="""
    WITH b AS (
        SELECT quantile_cont(l_extendedprice,
                             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
        FROM lineitem
    ),
    bucketed AS (
        SELECT CAST(
                 len(list_filter(b.qs, q -> l.l_extendedprice > q)) AS BIGINT
               ) AS bucket,
               l.l_extendedprice
        FROM lineitem l CROSS JOIN b
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(l_extendedprice) AS lo,
           MAX(l_extendedprice) AS hi
    FROM bucketed GROUP BY 1
    """,
    doc="Equi-depth (quantile-bucketed) histogram: exact decile boundaries "
    "in one aggregate, bucket = count of boundaries below the value - "
    "near-equal bucket populations however skewed the distribution "
    "(the equi-width twin is price_histogram).",
)
def price_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary computation is one grouped-percentile aggregate; bucket
    assignment broadcasts the 9 boundaries and counts those below each
    value (branch-free, codegen'd). At 100 TB swap the exact percentile
    for percentile_approx and keep the identical bucketing pass - the
    equi-depth property survives the sketch (see
    percentile_price_profile_approx for the tolerance pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = li.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("qs")
    )
    return (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(qs))
        .select(
            F.expr("size(filter(qs, q -> l_extendedprice > q))")
            .cast("long")
            .alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


SKEW_TOP_K = 5


@register(
    "join_key_skew_report",
    oracle=f"""
    WITH counts AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    stats AS (
        SELECT MAX(n) AS max_n, quantile_cont(n, 0.5) AS p50_n,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM counts
    )
    SELECT c.o_custkey, c.n, s.n_keys,
           c.n / s.p50_n AS skew_vs_median,
           CAST(c.n = s.max_n AS BIGINT) AS is_heaviest
    FROM counts c CROSS JOIN stats s
    ORDER BY c.n DESC, c.o_custkey LIMIT {SKEW_TOP_K}
    """,
    doc=f"Join-key skew diagnostic: top-{SKEW_TOP_K} heaviest o_custkey "
    "values with their multiple of the median key weight - the report "
    "that decides between plain shuffle, AQE skew split, and explicit "
    "salting (operators/skew.py) BEFORE the join runs.",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-grain counts (one shuffle with map-side combine), single-row
    global stats broadcast back, top-k via TakeOrderedAndProject. Run it
    on the build side of any big join: skew_vs_median >> 1 on a hot key
    is the signal that a 1000-executor shuffle will strand its tail on
    one task - the exact condition salted_join_skew_guard exists for."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.max("n").alias("max_n"),
        F.expr("percentile(n, 0.5)").alias("p50_n"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "o_custkey",
            "n",
            "n_keys",
            (F.col("n") / F.col("p50_n")).alias("skew_vs_median"),
            (F.col("n") == F.col("max_n")).cast("long").alias("is_heaviest"),
        )
        .orderBy(F.col("n").desc(), "o_custkey")
        .limit(SKEW_TOP_K)
    )


@register(
    "customer_order_reconciliation",
    oracle="""
    WITH agg AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT COALESCE(c.c_custkey, a.o_custkey) AS custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'orphan_orders'
                WHEN a.o_custkey IS NULL THEN 'no_orders'
                ELSE 'matched' END AS status,
           COALESCE(a.n_orders, 0) AS n_orders
    FROM customer c FULL OUTER JOIN agg a ON c.c_custkey = a.o_custkey
    """,
    doc="FULL OUTER reconciliation: every customer and every ordering key "
    "classified matched / no_orders / orphan_orders in one pass - the "
    "audit twin of the anti-join (which only shows one side's misses).",
)
def customer_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named full-outer operator (merge_upsert uses the same join
    internally): aggregate the fact to key grain FIRST so the outer join
    is dim x keys, not dim x fact - at 100 TB the pre-aggregation is the
    difference between a keyed-summary join and an outer-join row
    explosion."""
    cust = load_table(spark, sf_dir, "customer")
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = cust.join(agg, cust.c_custkey == agg.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.when(F.col("c_custkey").isNull(), "orphan_orders")
        .when(F.col("o_custkey").isNull(), "no_orders")
        .otherwise("matched")
        .alias("status"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@register(
    "user_event_sequence_hash",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS seq_len,
           md5(string_agg(event_type, '>' ORDER BY ts, event_id)) AS seq_hash
    FROM events
    GROUP BY user_id
    """,
    doc="Behavior-sequence extraction (sequence-model training prep): per "
    "user, event types concatenated in strict (ts, event_id) order; the "
    "md5 keeps arbitrarily long sequences hash-checkable.",
)
def user_event_sequence_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning event streams into ordered token sequences is step one of
    every behavioral-sequence model. Spark has no ordered string_agg, so
    the deterministic ordering comes from sort_array over (ts, event_id,
    type) structs inside ONE aggregation - no window sort, one shuffle on
    user_id, and the struct sort is per-group in memory (bounded by
    events-per-user, the same bound any sequence model needs anyway)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("seq_len"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("ts_us"),
                        F.col("event_id").alias("eid"),
                        F.col("event_type").alias("et"),
                    )
                )
            ).alias("seq"),
        )
        .select(
            "user_id",
            "seq_len",
            F.md5(F.concat_ws(">", F.expr("transform(seq, s -> s.et)"))).alias(
                "seq_hash"
            ),
        )
    )


BASKET_TOP_K = 25


@register(
    "copurchase_part_pairs",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY support DESC, part_a, part_b
    LIMIT {BASKET_TOP_K}
    """,
    doc=f"Market-basket co-purchase pairs (A-priori support step): "
    f"distinct items per order self-joined within the order key, top-"
    f"{BASKET_TOP_K} part pairs by support - the frequent-itemset "
    "primitive recommender candidate generation starts from.",
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The within-basket self-join is keyed on the order, so pair
    generation is bounded by max-items-per-basket squared per order
    (single-digit here, never corpus-quadratic); the distinct-first
    projection collapses reorder lines before pairing. At 100 TB the
    (basket, item) dedup shuffle dominates and the pair count stays
    linear in orders - the standard A-priori scaling. Top-k via
    TakeOrderedAndProject on the (pair) aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(BASKET_TOP_K)
    )


def _ols_trend_kernel(pdf):
    """Per-nation OLS fit in exact integer arithmetic: Python ints are
    unbounded, so every moment (Sx, Sy, Sxy, Sxx) is exact; the only
    floats are the final slope/intercept divisions — reproducible in any
    engine that forms the same exact moments (the DuckDB oracle does)."""
    import pandas as pd

    xs = [int(v) for v in pdf["x"]]
    ys = [int(v) for v in pdf["y_micros"]]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        {
            "nation": [int(pdf["nation"].iloc[0])],
            "n_months": [n],
            "slope_micros": [slope],
            "intercept_micros": [intercept],
        }
    )


@register(
    "nation_revenue_trend",
    oracle="""
    WITH monthly AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
               (EXTRACT(year FROM o.o_orderdate) - 1995) * 12
                   + EXTRACT(month FROM o.o_orderdate) - 1 AS x,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) * 1000000
                    AS BIGINT) AS y_micros
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y_micros) AS BIGINT) AS sy,
               CAST(SUM(x * y_micros) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM monthly GROUP BY 1
    )
    SELECT nation, n AS n_months,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_micros,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS intercept_micros
    FROM m
    """,
    doc="Grouped-map applyInPandas: per-nation OLS trend over monthly "
    "revenue, moments formed in exact integers (unbounded Python ints / "
    "BIGINT-HUGEINT SQL) so the fitted line is bit-identical across "
    "engines - the Arrow grouped-kernel pattern for per-group model fits.",
)
def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch grouped-map API (groupBy().applyInPandas) next to the
    streaming stateful ones: each nation's monthly series arrives as one
    Arrow batch in pandas, the fit runs per group, output is one row per
    group. Scale: the kernel sees month-grain aggregates (84 rows/group),
    not facts - aggregate FIRST, model per group after; Arrow transfer is
    group-sized. Quantization: revenue in integer micros so kernel-side
    sums are exact (SURVEY R2 float discipline)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").cast("long").alias("nation"),
            (
                (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
            ).alias("x"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * 1_000_000)
            .cast("long")
            .alias("y_micros")
        )
    )
    return monthly.groupBy("nation").applyInPandas(
        _ols_trend_kernel,
        schema="nation long, n_months long, slope_micros double, intercept_micros double",
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) set-overlap sketch
# ---------------------------------------------------------------------------

#: Sketch size: K smallest hashes represent each user set. Estimator std
#: error ~ 1/sqrt(K) ≈ 12.5% — the output carries the exact Jaccard
#: alongside so the driver hash-checks BOTH (the estimate is itself a
#: deterministic pure function of the data, so it needs no tolerance).
KMV_K = 64


@register(
    "kmv_set_overlap",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
        SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h, user_id FROM du
    ),
    sk AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY h, user_id
                   ) AS rk
            FROM hashed
        ) WHERE rk <= {KMV_K}
    ),
    types AS (SELECT DISTINCT event_type FROM du),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM types a, types b WHERE a.event_type < b.event_type
    ),
    pair_hashes AS (
        SELECT p.type_a, p.type_b, s.h, 1 AS is_a, 0 AS is_b
        FROM pairs p JOIN sk s ON s.event_type = p.type_a
        UNION ALL
        SELECT p.type_a, p.type_b, s.h, 0, 1
        FROM pairs p JOIN sk s ON s.event_type = p.type_b
    ),
    merged AS (
        SELECT type_a, type_b, h,
               MAX(is_a) AS in_a, MAX(is_b) AS in_b
        FROM pair_hashes GROUP BY 1, 2, 3
    ),
    kept AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY type_a, type_b ORDER BY h
            ) AS rk
            FROM merged
        ) WHERE rk <= {KMV_K}
    ),
    est AS (
        SELECT type_a, type_b,
               CAST(SUM(in_a * in_b) AS DOUBLE) / {KMV_K} AS est_jaccard
        FROM kept GROUP BY 1, 2
    ),
    sizes AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1
    ),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM du a JOIN du b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, e.est_jaccard,
           CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
               / (sa.n + sb.n - COALESCE(i.n_inter, 0)) AS exact_jaccard
    FROM pairs p
    JOIN est e ON e.type_a = p.type_a AND e.type_b = p.type_b
    LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
    doc=f"KMV (k-minimum-values) sketch: each event_type's audience is "
    f"summarized by its {KMV_K} smallest md5(user_id) values; pairwise "
    "Jaccard similarity is estimated as the fraction of the union's "
    f"{KMV_K} smallest hashes present in both sketches, reported next to "
    "the exact Jaccard as the built-in accuracy check.",
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via mergeable sketches — the 'how similar are the
    user bases of X and Y' question that an exact answer needs a full
    distinct-user self-join for.

    Scale: the sketch path touches the big table ONCE — distinct
    (type, user) is one shuffle, the per-type K-smallest is a window
    whose group-limit pushdown keeps only K rows per partition before
    the sort completes. Everything after operates on |types| × K rows.
    Sketches are mergeable (union = K smallest of concatenation), so
    per-day / per-shard sketches roll up without revisiting raw data —
    the same property the HLL family exploits. The exact branch (distinct
    self-join) exists as the accuracy harness; production at 100 TB runs
    the sketch branch only."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    hashed = du.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("h"), "user_id"
    )
    w_sk = Window.partitionBy("event_type").orderBy("h", "user_id")
    sk = (
        hashed.withColumn("rk", F.row_number().over(w_sk))
        .filter(F.col("rk") <= KMV_K)
        .select("event_type", "h")
    )
    types = du.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(F.broadcast(types.select(F.col("event_type").alias("type_b"))))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    a_side = pairs.join(
        sk.withColumnRenamed("event_type", "type_a"), "type_a"
    ).select("type_a", "type_b", "h", F.lit(1).alias("is_a"), F.lit(0).alias("is_b"))
    b_side = pairs.join(
        sk.withColumnRenamed("event_type", "type_b"), "type_b"
    ).select("type_a", "type_b", "h", F.lit(0).alias("is_a"), F.lit(1).alias("is_b"))
    merged = (
        a_side.unionAll(b_side)
        .groupBy("type_a", "type_b", "h")
        .agg(F.max("is_a").alias("in_a"), F.max("is_b").alias("in_b"))
    )
    w_u = Window.partitionBy("type_a", "type_b").orderBy("h")
    est = (
        merged.withColumn("rk", F.row_number().over(w_u))
        .filter(F.col("rk") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            (F.sum(F.col("in_a") * F.col("in_b")).cast("double") / KMV_K).alias(
                "est_jaccard"
            )
        )
    )
    sizes = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        du.select(F.col("event_type").alias("type_a"), "user_id")
        .join(du.select(F.col("event_type").alias("type_b"), "user_id"), "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(est, ["type_a", "type_b"])
        .join(inter, ["type_a", "type_b"], "left")
        .join(F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))), "type_a")
        .join(F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))), "type_b")
        .select(
            "type_a",
            "type_b",
            "est_jaccard",
            (
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("n_inter"), F.lit(0)))
            ).alias("exact_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q21/Q22-shaped correlated-subquery workloads
# ---------------------------------------------------------------------------


@register(
    "supplier_sole_blame",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numblame
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY 1
    """,
    doc="TPC-H Q21 shape: suppliers who were the ONLY supplier with a "
    "returned line on a finished multi-supplier order — EXISTS(another "
    "supplier) AND NOT EXISTS(another returning supplier), counted per "
    "supplier. Oracle states the two correlated subqueries literally; "
    "the engine computes both predicates from ONE per-order aggregate.",
)
def supplier_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic Q21 rewrite: the naive plan walks lineitem three times
    (probe + correlated semi + correlated anti — two extra fact-scale
    shuffles and the anti's NULL-trap). Instead aggregate lineitem ONCE
    per order — n_suppliers = countDistinct(suppkey), n_ret_suppliers =
    countDistinct(suppkey) where returned — and the predicates collapse
    to arithmetic: EXISTS(other supplier) ⇔ n_suppliers ≥ 2; NOT
    EXISTS(other returner) ⇔ n_ret_suppliers = 1 (the probe row itself
    is returned). One fact shuffle on l_orderkey shared by probe and
    stats, broadcast supplier/order filters — survives 100× because
    nothing exceeds order-grain cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    order_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_suppliers"),
    )
    probe = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                F.col("o_orderkey").alias("l_orderkey")
            ),
            "l_orderkey",
        )
        .join(order_stats, "l_orderkey")
        .filter((F.col("n_suppliers") >= 2) & (F.col("n_ret_suppliers") == 1))
    )
    return (
        probe.join(
            F.broadcast(sup.select(F.col("s_suppkey").alias("l_suppkey"), "s_name")),
            "l_suppkey",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numblame"))
    )


@register(
    "high_balance_inactive",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS threshold
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.threshold
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY 1
    """,
    doc="TPC-H Q22 shape: customers with above-average balance (among "
    "positive balances) and no orders since 2001-01-01 (churned "
    "high-value accounts) — scalar aggregate subquery threshold + NOT "
    "EXISTS anti-join over a date-bounded order window, rolled up per "
    "market segment as (count, exact-decimal balance sum).",
)
def high_balance_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the threshold is a single-row aggregate broadcast back
    (never a driver round-trip inside the plan), the NOT EXISTS is a
    left-anti shuffle on c_custkey against orders keys only (column-
    pruned probe), and the rollup is segment-grain. The average divides
    an exact DECIMAL sum by an exact count, so the threshold — and hence
    set membership near the boundary — is bit-identical to the oracle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("threshold")
    )
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(
            orders.filter(F.col("o_orderdate") >= "2001-01-01").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
    )


@register(
    "weighted_median_price",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               l_extendedprice AS price,
               CAST(round(l_quantity) AS BIGINT) AS wt,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, price, wt,
               SUM(wt) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY price, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cw,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS total_w
        FROM w
    )
    SELECT l_returnflag,
           MIN(price) AS weighted_median,
           CAST(MIN(total_w) AS BIGINT) AS total_weight
    FROM cum
    WHERE cw * 2 >= total_w
    GROUP BY 1
    """,
    doc="Quantity-weighted median price per return flag: the smallest "
    "price whose cumulative quantity reaches half the flag's total — "
    "the 'median unit sold' (not median line), robust to a few huge "
    "cheap lines. Integer weights + integer half-point compare, so the "
    "boundary row is engine-exact.",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one window per group key (cumulative weight) + the
    per-group total as an unordered window — both partition-local after
    a single shuffle on l_returnflag. Intra-tie row order can't change
    the answer (every row of the boundary price yields the same MIN),
    but the ORDER BY still carries the unique key so the cum column is
    deterministic row-for-row. At whale-group scale use the two-phase
    chunked cumulative (per-chunk sums → offsets), or the approximate
    twin: percentile_approx over weight-replicated values."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.round("l_quantity").cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    cum_w = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("l_returnflag")
    cum = w.select(
        "l_returnflag",
        "price",
        F.sum("wt").over(cum_w).alias("cw"),
        F.sum("wt").over(tot_w).alias("total_w"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("total_w"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.min("total_w").cast("long").alias("total_weight"),
        )
    )


@register(
    "price_quantity_corr",
    oracle="""
    WITH m AS (
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sxy,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxx,
               CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)
                        * CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS syy
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY 1
    )
    SELECT n_name, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               AS corr_price_qty
    FROM m
    """,
    doc="Pearson correlation of line price vs quantity per supplier "
    "nation, computed from exact integer moments (cents / whole units) "
    "so both engines feed IDENTICAL integers into the identical final "
    "double expression — corr() builtins disagree across engines at the "
    "ulp level; this formulation cannot.",
)
def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one fact pass accumulating five integer moments per group
    (all map-side combinable), broadcast dim joins — the moments shuffle
    is |nations| rows. The same shape computes covariance matrices for
    feature stores: moments are mergeable state, so per-shard partials
    roll up exactly. Overflow headroom: cents ≤ 10^7, so Σx² per group
    needs ~10^14·rows — switch the moment columns to DECIMAL(38,0) well
    before 10^4-row groups become 10^9 (the expression shape and the
    oracle stay unchanged)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    x = F.round(F.col("l_extendedprice") * 100).cast("long")
    y = F.round(F.col("l_quantity")).cast("long")
    m = (
        li.join(
            F.broadcast(sup.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
            "l_suppkey",
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("s_nationkey"), "n_name")),
            "s_nationkey",
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    return m.select(
        "n_name",
        "n",
        (
            (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (
                F.sqrt(nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                * F.sqrt(nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
            )
        ).alias("corr_price_qty"),
    )


@register(
    "decile_transition_matrix",
    oracle="""
    WITH prev_spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1
    ),
    curr_spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1
    ),
    prev_d AS (
        SELECT o_custkey,
               NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
        FROM prev_spend
    ),
    curr_d AS (
        SELECT o_custkey,
               NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
        FROM curr_spend
    )
    SELECT CAST(COALESCE(p.decile, 0) AS INT) AS decile_prev,
           CAST(COALESCE(c.decile, 0) AS INT) AS decile_curr,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM prev_d p FULL OUTER JOIN curr_d c ON p.o_custkey = c.o_custkey
    GROUP BY 1, 2
    """,
    doc="Customer spend-decile migration across two periods (pre/post "
    "1998): each period ranks its own customers into deciles (decile 0 "
    "= absent that period); the full-outer join + count yields the "
    "transition matrix — the churn/upsell movement report.",
)
def decile_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each period's decile assignment goes through
    ``global_ntile`` (operators/ranks.py) — range-bucketed global rank,
    no single-partition window — then one key-grain full-outer join and
    a ≤121-cell aggregate. The oracle keeps the plain NTILE formulation;
    both must agree cell-for-cell, which exercises the exact-NTILE
    arithmetic twice under different populations."""
    from etl_loading_scripts_spark.operators.ranks import global_ntile

    orders = load_table(spark, sf_dir, "orders")

    def period_deciles(pred, out_col: str) -> DataFrame:
        spend = (
            orders.filter(pred)
            .groupBy("o_custkey")
            .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("spend"))
        )
        tiled = global_ntile(
            spend.withColumn("__neg__", -F.col("spend")),
            10,
            ["__neg__", "o_custkey"],
            tile_col=out_col,
        )
        return tiled.select("o_custkey", out_col)

    prev_d = period_deciles(F.col("o_orderdate") < "1998-01-01", "decile_prev")
    curr_d = period_deciles(F.col("o_orderdate") >= "1998-01-01", "decile_curr")
    return (
        prev_d.join(curr_d, "o_custkey", "full_outer")
        .select(
            F.coalesce("decile_prev", F.lit(0)).cast("int").alias("decile_prev"),
            F.coalesce("decile_curr", F.lit(0)).cast("int").alias("decile_curr"),
        )
        .groupBy("decile_prev", "decile_curr")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "star_join_selective",
    oracle="""
    SELECT n.n_name, p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 2
    """,
    doc="Selective 5-way star join (TPC-H Q8/Q9 shape): fact lineitem "
    "joined to four filtered dimensions (economy parts, 1997-98 orders, "
    "building-segment customers, supplier nation), revenue rolled up per "
    "(nation, brand) with exact decimal discount math.",
)
def star_join_selective(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-ordering stress test: written in ARBITRARY order, the
    physical plan must still (a) push every dim filter into its scan,
    (b) broadcast the filtered dims against the single fact pass, and
    (c) aggregate only after all selectivity is applied. Catalyst does
    all three from the declarative form — the orders side exceeds the
    broadcast threshold unfiltered but its date filter makes it
    broadcastable, which AQE detects from runtime stats at 100 TB when
    static estimates are off. One fact scan, zero fact-to-fact
    shuffles; the rollup's group count is |nations|×|brands|."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1) - F.col("l_discount").cast(DEC))
    )
    return (
        li.join(F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"), "p_brand")), "l_partkey")
        .join(F.broadcast(sup.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")), "l_suppkey")
        .join(F.broadcast(nat.select(F.col("n_nationkey").alias("s_nationkey"), "n_name")), "s_nationkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"),
            "l_orderkey",
        )
        .join(
            F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_semi",
        )
        .groupBy("n_name", "p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@register(
    "region_nation_share",
    oracle="""
    WITH nat AS (
        SELECT r.r_name, n.n_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
                   AS nat_spend
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ),
    reg AS (
        SELECT r_name, CAST(SUM(nat_spend) AS DECIMAL(38,4)) AS reg_spend
        FROM nat GROUP BY 1
    ),
    g_all AS (
        SELECT CAST(SUM(reg_spend) AS DECIMAL(38,4)) AS global_spend FROM reg
    )
    SELECT n.r_name, n.n_name,
           CAST(n.nat_spend AS DOUBLE) AS nat_spend,
           CAST(n.nat_spend AS DOUBLE) / CAST(r.reg_spend AS DOUBLE)
               AS share_of_region,
           CAST(r.reg_spend AS DOUBLE) / CAST(g.global_spend AS DOUBLE)
               AS region_share_of_global
    FROM nat n
    JOIN reg r ON r.r_name = n.r_name
    CROSS JOIN g_all g
    """,
    doc="Two-level ratio-to-parent rollup: nation spend as a share of "
    "its region, region spend as a share of global — the nested "
    "percent-of-total report, every denominator an exact-decimal "
    "re-aggregation of the level below.",
)
def region_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the fact is aggregated ONCE at the finest grain
    (nation); region and global totals are grain-to-grain re-aggs of
    those ≤|nations| rows — never a second fact pass, never a global
    window over fact rows. Parent totals join back by key (region) and
    by broadcast single-row (global). Exact DECIMAL sums end-to-end;
    doubles appear only in the final share divisions, from identical
    decimal inputs in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    nat_spend = (
        orders.join(
            F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey"
                )
            ),
            "c_nationkey",
        )
        .join(
            F.broadcast(reg.select(F.col("r_regionkey").alias("n_regionkey"), "r_name")),
            "n_regionkey",
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(38,4)").alias("nat_spend")
        )
    )
    reg_spend = nat_spend.groupBy("r_name").agg(
        F.sum("nat_spend").cast("decimal(38,4)").alias("reg_spend")
    )
    glob = reg_spend.agg(
        F.sum("reg_spend").cast("decimal(38,4)").alias("global_spend")
    )
    return (
        nat_spend.join(F.broadcast(reg_spend), "r_name")
        .crossJoin(F.broadcast(glob))
        .select(
            "r_name",
            "n_name",
            F.col("nat_spend").cast("double").alias("nat_spend"),
            (F.col("nat_spend").cast("double") / F.col("reg_spend").cast("double")).alias(
                "share_of_region"
            ),
            (
                F.col("reg_spend").cast("double") / F.col("global_spend").cast("double")
            ).alias("region_share_of_global"),
        )
    )


# ---------------------------------------------------------------------------
# From-scratch HyperLogLog as pure relational algebra
# ---------------------------------------------------------------------------

#: Register count (m). alpha_m = 0.7213/(1 + 1.079/m) for m = 64.
HLL_M = 64
HLL_ALPHA = 0.709365

#: rho cap: 2^-rho summands stay within double's exact-accumulation span
#: (exponent range < 53 bits) so the register sum is EXACT and therefore
#: order-independent — the property that makes this sketch hash-checkable
#: across engines. Cap cost: underestimates rho only past 2^40 trailing
#: zeros (probability 2^-40 per hash).
HLL_RHO_CAP = 40

_NIBVAL = (
    "CASE {c} "
    + " ".join(f"WHEN '{x:x}' THEN {x}" for x in range(16))
    + " END"
)


def _hll_terms_sql(hcol: str) -> dict[str, str]:
    """SQL fragments (valid in BOTH Spark SQL and DuckDB) for bucket and
    rho of one md5 hex string: bucket = first-byte mod m; rho = leading
    zero bits of the next 13 nibbles + 1, capped."""
    nib1 = _NIBVAL.format(c=f"substr({hcol}, 1, 1)")
    nib2 = _NIBVAL.format(c=f"substr({hcol}, 2, 1)")
    bucket = f"(({nib1}) % 4) * 16 + ({nib2})"
    stripped = f"TRIM(LEADING '0' FROM substr({hcol}, 3, 13))"
    within = (
        f"CASE WHEN substr({stripped}, 1, 1) = '1' THEN 3 "
        f"WHEN substr({stripped}, 1, 1) IN ('2','3') THEN 2 "
        f"WHEN substr({stripped}, 1, 1) IN ('4','5','6','7') THEN 1 "
        "ELSE 0 END"
    )
    rho = (
        f"CASE WHEN length({stripped}) = 0 THEN {HLL_RHO_CAP} "
        f"ELSE LEAST((13 - length({stripped})) * 4 + ({within}) + 1, {HLL_RHO_CAP}) END"
    )
    return {"bucket": bucket, "rho": rho}


_HLL = _hll_terms_sql("h")


@register(
    "hll_manual_distinct",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT o_orderpriority,
               md5(CAST(o_custkey AS VARCHAR)) AS h
        FROM orders
    ),
    regs AS (
        SELECT o_orderpriority,
               {_HLL['bucket']} AS bucket,
               MAX({_HLL['rho']}) AS m_j
        FROM hashed GROUP BY 1, 2
    ),
    sums AS (
        SELECT o_orderpriority,
               SUM(pow(2.0, -m_j)) AS sum_present,
               CAST(COUNT(*) AS BIGINT) AS n_present
        FROM regs GROUP BY 1
    ),
    ex AS (
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
        FROM orders GROUP BY 1
    )
    SELECT e.o_orderpriority, e.n_exact,
           {HLL_ALPHA} * {HLL_M} * {HLL_M}
               / (s.sum_present + ({HLL_M} - s.n_present)) AS hll_estimate,
           ({HLL_ALPHA} * {HLL_M} * {HLL_M}
               / (s.sum_present + ({HLL_M} - s.n_present)) - e.n_exact)
               / e.n_exact AS rel_err
    FROM ex e JOIN sums s ON s.o_orderpriority = e.o_orderpriority
    """,
    doc=f"HyperLogLog from scratch as relational algebra: {HLL_M} "
    "registers from md5 bits (bucket = first byte mod m, register = max "
    "leading-zero run of the next 52 bits), raw harmonic-mean estimate "
    "next to the exact distinct count. Unlike approx_count_distinct "
    "(engine-internal sketch), every intermediate here is deterministic "
    "and the result value-hash-matches an independent engine.",
)
def hll_manual_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why this is more than a parlor trick: the register table (group,
    bucket, max rho) IS the sketch — mergeable by MAX across shards/days,
    storable as a tiny table, re-estimable without touching raw data; the
    whole lifecycle is plain SQL a warehouse can run. Scale: the distinct
    pass is the only fact-sized shuffle; registers are ≤ m rows per
    group. The rho cap keeps every 2^-rho summand inside double's exact
    span, so the register sum is exact and order-independent — no
    float-accumulation nondeterminism (the docstring constant explains
    the bound). Raw estimate only (no small/large-range corrections):
    corrections branch on ln(), whose cross-engine bit-identity is not
    guaranteed."""
    orders = load_table(spark, sf_dir, "orders")
    hashed = (
        orders.select("o_orderpriority", "o_custkey")
        .distinct()
        .select(
            "o_orderpriority",
            F.md5(F.col("o_custkey").cast("string")).alias("h"),
        )
    )
    regs = (
        hashed.select(
            "o_orderpriority",
            F.expr(_HLL["bucket"]).alias("bucket"),
            F.expr(_HLL["rho"]).alias("rho"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    sums = regs.groupBy("o_orderpriority").agg(
        F.sum(F.expr("pow(2.0, -m_j)")).alias("sum_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    ex = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    est = (
        F.lit(HLL_ALPHA)
        * HLL_M
        * HLL_M
        / (F.col("sum_present") + (F.lit(HLL_M) - F.col("n_present")))
    )
    return ex.join(sums, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        est.alias("hll_estimate"),
        ((est - F.col("n_exact")) / F.col("n_exact")).alias("rel_err"),
    )


#: Bloom filter geometry: m bits, k independent hash functions derived
#: from prefixed md5 evaluations (3 hex nibbles = 12 bits, mod m).
BLOOM_BITS = 1024
BLOOM_K = 3


def _bloom_bit_sql(prefix: int, xcol: str) -> str:
    h = f"md5(concat('{prefix}|', CAST({xcol} AS VARCHAR)))"
    n1 = _NIBVAL.format(c=f"substr({h}, 1, 1)")
    n2 = _NIBVAL.format(c=f"substr({h}, 2, 1)")
    n3 = _NIBVAL.format(c=f"substr({h}, 3, 1)")
    return f"((({n1}) * 256 + ({n2}) * 16 + ({n3})) % {BLOOM_BITS})"


@register(
    "bloom_filter_probe",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    ),
    bits AS (
        {" UNION ".join(f"SELECT DISTINCT {_bloom_bit_sql(j, 'k')} AS bit FROM members" for j in range(BLOOM_K))}
    ),
    probe AS (
        {" UNION ALL ".join(f"SELECT c_custkey, c_mktsegment, {_bloom_bit_sql(j, 'c_custkey')} AS bit FROM customer" for j in range(BLOOM_K))}
    ),
    hits AS (
        SELECT p.c_custkey, p.c_mktsegment,
               CAST(COUNT(b.bit) AS BIGINT) AS n_hits
        FROM probe p LEFT JOIN bits b ON b.bit = p.bit
        GROUP BY 1, 2
    ),
    verdicts AS (
        SELECT h.c_custkey, h.c_mktsegment,
               CAST(h.n_hits = {BLOOM_K} AS BIGINT) AS maybe,
               CAST(m.k IS NOT NULL AS BIGINT) AS actual
        FROM hits h LEFT JOIN members m ON m.k = h.c_custkey
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(SUM(maybe) AS BIGINT) AS n_maybe,
           CAST(SUM(actual) AS BIGINT) AS n_actual,
           CAST(SUM(maybe) - SUM(actual) AS BIGINT) AS n_false_pos
    FROM verdicts GROUP BY 1
    """,
    doc=f"Bloom filter from scratch as relational algebra: {BLOOM_K} "
    f"md5-derived bit positions over {BLOOM_BITS} bits for the "
    "recent-orders key set; every customer is probed (member iff ALL k "
    "bits set) and the per-segment maybe/actual/false-positive counts "
    "quantify the filter — no-false-negative invariant included "
    "(n_maybe ≥ n_actual, both reported).",
)
def bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semi-join pre-filter pattern: at 100 TB you don't hash-join a
    fact to a dim to discover most rows DON'T match — you broadcast a
    Bloom filter of the interesting keys (here ≤1024 distinct bit rows,
    kilobytes at any member cardinality) and discard non-matches
    map-side; only 'maybe' rows pay the real join (Catalyst's AQE
    runtime filters do this internally — this operator is the explicit,
    storable, mergeable-by-OR version). The bits/probe/verify joins are
    all equi-joins on int bit positions; exact membership is computed
    alongside purely to report the realized false-positive rate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    members = (
        orders.filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = None
    for j in range(BLOOM_K):
        b = members.select(
            F.expr(_bloom_bit_sql(j, "k").replace("AS VARCHAR", "AS STRING")).alias("bit")
        ).distinct()
        bits = b if bits is None else bits.unionAll(b).distinct()
    probe = None
    for j in range(BLOOM_K):
        p = cust.select(
            "c_custkey",
            "c_mktsegment",
            F.expr(
                _bloom_bit_sql(j, "c_custkey").replace("AS VARCHAR", "AS STRING")
            ).alias("bit"),
        )
        probe = p if probe is None else probe.unionAll(p)
    hits = (
        probe.join(F.broadcast(bits.withColumn("__hit__", F.lit(1))), "bit", "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("__hit__").alias("n_hits"))
    )
    verdicts = hits.join(
        members.withColumnRenamed("k", "c_custkey").withColumn("__m__", F.lit(1)),
        "c_custkey",
        "left",
    ).select(
        "c_mktsegment",
        (F.col("n_hits") == BLOOM_K).cast("long").alias("maybe"),
        F.col("__m__").isNotNull().cast("long").alias("actual"),
    )
    return verdicts.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("maybe").alias("n_maybe"),
        F.sum("actual").alias("n_actual"),
        (F.sum("maybe") - F.sum("actual")).alias("n_false_pos"),
    )


TOP_N_OTHERS = 5


@register(
    "top_nations_with_others",
    oracle=f"""
    WITH nat AS (
        SELECT n.n_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
                   AS spend
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1
    ),
    ranked AS (
        SELECT n_name, spend,
               ROW_NUMBER() OVER (ORDER BY spend DESC, n_name) AS rk
        FROM nat
    )
    SELECT n_name AS bucket, CAST(spend AS DOUBLE) AS spend,
           CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {TOP_N_OTHERS}
    UNION ALL
    SELECT 'OTHER', CAST(SUM(spend) AS DOUBLE), CAST({TOP_N_OTHERS + 1} AS INT)
    FROM ranked WHERE rk > {TOP_N_OTHERS}
    """,
    doc=f"Top-{TOP_N_OTHERS} nations by customer spend plus a single "
    "'OTHER' row aggregating the remainder — the BI presentation "
    "pattern where the tail must still sum to the true total (exact "
    "decimal re-aggregation, not a dropped residue).",
)
def top_nations_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the fact aggregates once to nation grain (≤ |nations|
    rows); rank and the OTHER re-agg operate on that tiny set, so the
    'global' ROW_NUMBER window is over dimension-cardinality rows —
    fine at any fact size (it is the FACT-grain global window this
    engine bans, see global_ntile). Keeps the invariant Σ(top rows) +
    OTHER = grand total exactly, because the remainder is re-summed
    from the same exact decimals rather than differenced from a
    rounded total."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    nat_spend = (
        orders.join(
            F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
            "o_custkey",
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")),
            "c_nationkey",
        )
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(38,4)").alias("spend"))
    )
    w = Window.orderBy(F.col("spend").desc(), "n_name")
    ranked = nat_spend.withColumn("rk", F.row_number().over(w))
    top = ranked.filter(F.col("rk") <= TOP_N_OTHERS).select(
        F.col("n_name").alias("bucket"),
        F.col("spend").cast("double").alias("spend"),
        F.col("rk").cast("int").alias("rk"),
    )
    others = (
        ranked.filter(F.col("rk") > TOP_N_OTHERS)
        .agg(F.sum("spend").cast("double").alias("spend"))
        .select(
            F.lit("OTHER").alias("bucket"),
            "spend",
            F.lit(TOP_N_OTHERS + 1).cast("int").alias("rk"),
        )
    )
    return top.unionAll(others)


TRIPLE_SUPPORT = 2


@register(
    "frequent_triples_apriori",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    triples AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               c.l_partkey AS part_c,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        JOIN items c ON a.l_orderkey = c.l_orderkey
                    AND b.l_partkey < c.l_partkey
        GROUP BY 1, 2, 3
        HAVING COUNT(*) >= {TRIPLE_SUPPORT}
    )
    SELECT part_a, part_b, part_c, support FROM triples
    """,
    doc=f"Frequent 3-itemsets at support ≥ {TRIPLE_SUPPORT} (Apriori "
    "step 2): the oracle enumerates every within-basket triple "
    "directly; the engine prunes with the Apriori property first — "
    "candidate triples are built ONLY from frequent pairs, and counted "
    "only in baskets already containing a frequent pair.",
)
def frequent_triples_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Apriori pruning cascade, relationally: (1) frequent pairs =
    one within-basket self-join + support filter; (2) candidate triples
    = frequent pairs joined on their FIRST item ((a,b)+(a,c) → (a,b,c)),
    kept only if the third sub-pair (b,c) is also frequent (left-semi
    against the same pair set — the Apriori property); (3) support =
    count of baskets containing all three, via joining candidates to
    items three times on the basket key. At scale the unpruned triple
    enumeration is Σ|basket|³ — the pair-prune cuts candidates to the
    frequent-pair graph's triangles, orders of magnitude fewer; every
    join is an equi-join on (basket) or (item, item) keys."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "bk")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= TRIPLE_SUPPORT)
        .select("pa", "pb")
    )
    cand = (
        pairs.alias("x")
        .join(pairs.alias("y"), F.col("x.pa") == F.col("y.pa"))
        .filter(F.col("x.pb") < F.col("y.pb"))
        .select(
            F.col("x.pa").alias("part_a"),
            F.col("x.pb").alias("part_b"),
            F.col("y.pb").alias("part_c"),
        )
        .join(
            pairs.select(F.col("pa").alias("part_b"), F.col("pb").alias("part_c")),
            ["part_b", "part_c"],
            "left_semi",
        )
    )
    ia = items.select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("part_a"))
    ib = items.select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("part_b"))
    ic = items.select(F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("part_c"))
    return (
        cand.join(ia, "part_a")
        .join(ib, ["bk", "part_b"])
        .join(ic, ["bk", "part_c"])
        .groupBy("part_a", "part_b", "part_c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRIPLE_SUPPORT)
    )


N_SHARDS = 8


@register(
    "balanced_shard_assignment",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rk
        FROM toks
    )
    SELECT CAST((rk - 1) % {N_SHARDS} AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM ranked GROUP BY 1
    """,
    doc=f"Balanced training-shard assignment: documents ranked by token "
    f"count (descending) and dealt round-robin across {N_SHARDS} shards "
    "— the sorted-greedy (LPT) heuristic that bounds shard imbalance by "
    "one document; per-shard doc and token totals reported.",
)
def balanced_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why not hash-assign: hashing balances COUNTS, not BYTES — one
    shard inheriting the whale documents straggles the training epoch.
    Dealing in size order bounds the token gap between any two shards
    by max-min document size. Deterministic: re-runs and engines agree
    shard-for-shard, so shards are resumable/addressable artifacts.

    The size rank is the range-bucketed global ROW_NUMBER
    (``operators/ranks.global_row_number`` — ADVICE r2): documents are
    fact-grain, so the naive rank window's single-partition sort is
    exactly the pattern the engine bans elsewhere. DESC order comes from
    ranking on the negated token count (unique tie-break by doc_id), so
    the assignment is bit-identical to ``ROW_NUMBER() OVER (ORDER BY
    n_tokens DESC, doc_id)`` with no ``Exchange SinglePartition``."""
    from etl_loading_scripts_spark.operators.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_tokens")
    ).withColumn("__neg_tokens__", -F.col("n_tokens"))
    ranked = global_row_number(toks, ["__neg_tokens__", "doc_id"], rank_col="rk")
    return (
        ranked.groupBy(((F.col("rk") - 1) % N_SHARDS).cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


#: Trailing-window length for the exact EWMA query (days). Weights are
#: powers of two — 2^(EWMA_K-1-lag) — so the whole smoothing is integer
#: arithmetic and engine-exact; the normalizing denominator is returned
#: alongside the numerator instead of dividing (float EWMA can never
#: hash-match across engines).
EWMA_K = 8

#: (lag_days, weight = 2^(EWMA_K-1-lag)) pairs, emitted as a literal
#: 8-row table on both engines.
EWMA_WEIGHTS = [(lag, 1 << (EWMA_K - 1 - lag)) for lag in range(EWMA_K)]

_EWMA_VALUES = ", ".join(f"({lag}, {w})" for lag, w in EWMA_WEIGHTS)


@register(
    "ewma_daily_orders",
    oracle=f"""
    WITH base AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders
        GROUP BY 1
    ),
    lags(lag, w) AS (VALUES {_EWMA_VALUES}),
    contrib AS (
        SELECT b.day + CAST(l.lag AS INTEGER) AS day,
               CAST(b.cnt * l.w AS BIGINT) AS val,
               CAST(l.w AS BIGINT) AS w
        FROM base b CROSS JOIN lags l
    ),
    sm AS (
        SELECT day,
               CAST(SUM(val) AS BIGINT) AS ewma_num,
               CAST(SUM(w) AS BIGINT) AS ewma_den
        FROM contrib
        GROUP BY day
    )
    SELECT CAST(b.day AS VARCHAR) AS day, b.cnt, s.ewma_num, s.ewma_den
    FROM base b JOIN sm s ON b.day = s.day
    ORDER BY 1
    """,
    doc="Exponentially-weighted moving average of daily order volume "
    f"over a trailing {EWMA_K}-day window (alpha=1/2, weights "
    "2^(K-1-lag)), kept exact by returning the integer numerator and "
    "the per-day weight mass actually present instead of a float ratio. "
    "The recursive EWMA definition re-expressed as a bounded-lag "
    "scatter: each day broadcasts its count forward to the K days it "
    "influences — an equi-join, not a range join.",
)
def ewma_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the naive formulation is a range self-join (day BETWEEN
    d-K+1 AND d) which Spark can only run as a broadcast-nested-loop; we
    invert it into a *scatter* — explode each day-count into its K
    (target_day, weighted value) contributions via a broadcast 8-row
    weight table, then one hash aggregate on target_day. Every join is
    an equi-join; work is O(days * K) rows; no window over an
    unpartitioned global sort. The same shape handles per-key EWMA at
    fact grain (add the key to the scatter and the groupBy) on a
    billion keys without a single-partition stage. Truly recursive
    (unbounded-memory) EWMA is the streaming twin's job
    (applyInPandasWithState); a K-term window with geometric weights is
    the batch-exact standard."""
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.select(F.to_date("o_orderdate").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    lags = literal_table(spark, EWMA_WEIGHTS, "lag int, w long")
    contrib = (
        base.crossJoin(broadcast_scalar(lags))
        .select(
            F.expr("date_add(day, lag)").alias("day"),
            (F.col("cnt") * F.col("w")).alias("val"),
            "w",
        )
    )
    sm = contrib.groupBy("day").agg(
        F.sum("val").cast("long").alias("ewma_num"),
        F.sum("w").cast("long").alias("ewma_den"),
    )
    return base.join(sm, "day").select(
        F.col("day").cast("string").alias("day"), "cnt", "ewma_num", "ewma_den"
    ).orderBy("day")


@register(
    "winsorized_spend_by_nation",
    oracle="""
    WITH cents_t AS (
        SELECT n.n_name AS nation,
               c.c_custkey,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    ranked AS (
        SELECT nation, c_custkey, cents,
               ROW_NUMBER() OVER (
                   PARTITION BY nation ORDER BY cents, c_custkey
               ) AS rn,
               COUNT(*) OVER (PARTITION BY nation) AS n
        FROM cents_t
    ),
    thr AS (
        SELECT nation,
               CAST(MIN(n) AS BIGINT) AS n_customers,
               CAST(MIN(CASE WHEN rn * 10 >= n THEN cents END) AS BIGINT) AS lo_cents,
               CAST(MIN(CASE WHEN rn * 10 >= 9 * n THEN cents END) AS BIGINT) AS hi_cents
        FROM ranked
        GROUP BY nation
    )
    SELECT r.nation,
           t.n_customers,
           t.lo_cents,
           t.hi_cents,
           CAST(SUM(LEAST(GREATEST(r.cents, t.lo_cents), t.hi_cents)) AS BIGINT)
               AS winsorized_sum_cents,
           CAST(SUM(r.cents) AS BIGINT) AS raw_sum_cents
    FROM ranked r JOIN thr t ON r.nation = t.nation
    GROUP BY 1, 2, 3, 4
    ORDER BY 1
    """,
    doc="Robust (winsorized) account-balance total per nation: exact "
    "rank-based p10/p90 thresholds (rank*10 >= n integer compare — no "
    "float percentile), every balance clamped into [p10, p90] before "
    "summing, in exact integer cents. The outlier-resistant aggregate a "
    "finance rollup uses where plain SUM is whale-dominated.",
)
def winsorized_spend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on nation for the rank window (25 bounded
    partitions here; for a high-cardinality or whale group key the
    range-bucketed global rank in ``operators/ranks.py`` replaces the
    window), a nation-grain threshold aggregate joined back broadcast,
    then a map-side clamp + partial-agg sum. Thresholds are exact order
    statistics with (cents, custkey) total order, so the boundary row is
    engine-deterministic; all money math is integer cents end-to-end."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents_t = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            "c_custkey",
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    wpart = Window.partitionBy("nation")
    ranked = cents_t.select(
        "nation",
        "c_custkey",
        "cents",
        F.row_number().over(wpart.orderBy("cents", "c_custkey")).alias("rn"),
        F.count(F.lit(1)).over(wpart).alias("n"),
    )
    thr = ranked.groupBy("nation").agg(
        F.min("n").cast("long").alias("n_customers"),
        F.min(F.when(F.col("rn") * 10 >= F.col("n"), F.col("cents")))
        .cast("long")
        .alias("lo_cents"),
        F.min(F.when(F.col("rn") * 10 >= 9 * F.col("n"), F.col("cents")))
        .cast("long")
        .alias("hi_cents"),
    )
    return (
        ranked.join(F.broadcast(thr), "nation")
        .groupBy("nation", "n_customers", "lo_cents", "hi_cents")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents"))
            )
            .cast("long")
            .alias("winsorized_sum_cents"),
            F.sum("cents").cast("long").alias("raw_sum_cents"),
        )
        .orderBy("nation")
    )


@register(
    "event_type_diversity_gini",
    oracle="""
    WITH per_type AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events
        GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) * SUM(c) - SUM(c * c) AS BIGINT) AS gini_num,
           CAST(SUM(c) * SUM(c) AS BIGINT) AS gini_den
    FROM per_type
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Per-user behavioral diversity as exact Gini impurity of the "
    "event-type distribution: gini = 1 - sum(p_i^2) returned as the "
    "integer pair (n^2 - sum(c_i^2), n^2) so the measure is "
    "engine-exact. The entropy-style engagement-diversity metric with "
    "no floating-point log in the hot path.",
)
def event_type_diversity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two hash aggregates — (user, type) then user — both with
    map-side partial combine; cardinality is bounded by users x event
    types, never event grain after the first partial. No window, no
    sort, no float: the impurity is a ratio of exact 64-bit integers
    (overflow headroom: n^2 < 2^63 up to ~3e9 events per user)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            (F.sum("c") * F.sum("c") - F.sum(F.col("c") * F.col("c")))
            .cast("long")
            .alias("gini_num"),
            (F.sum("c") * F.sum("c")).cast("long").alias("gini_den"),
        )
        .orderBy("user_id")
    )


#: RFM reference date: one day past the dataset's order horizon, so
#: every recency is positive. Fixed constant — NOT derived from the data
#: (a data-derived anchor would make scores drift between loads).
RFM_ANCHOR = "1999-01-01"

#: Duplicate-order detection: same customer, totals in the same amount
#: band, within this many days. The band width (currency units) absorbs
#: small line-level differences the way an AP auditor treats "roughly
#: the same invoice amount"; tighten to exact cents when the data has
#: true resubmissions.
DUP_ORDER_WINDOW_DAYS = 90
DUP_ORDER_BAND = 100


@register(
    "rfm_segmentation",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey,
               date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                         DATE '{RFM_ANCHOR}') AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS monetary_cents
        FROM orders
        GROUP BY 1
    ),
    scored AS (
        SELECT o_custkey, recency_days, frequency, monetary_cents,
               NTILE(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
               NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
               NTILE(5) OVER (ORDER BY monetary_cents, o_custkey) AS m_score
        FROM base
    )
    SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_code,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents,
           CAST(MIN(o_custkey) AS BIGINT) AS sample_custkey
    FROM scored
    GROUP BY 1
    ORDER BY 1
    """,
    doc="RFM (recency/frequency/monetary) customer segmentation: exact "
    "quintile scores on each dimension (NTILE(5) semantics, unique "
    "custkey tie-break, recency scored so 5 = most recent), rolled up "
    "per 3-digit RFM code. The classic CRM segmentation, produced with "
    "no single-partition sort.",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: three independent ``global_ntile`` passes (range-bucketed
    rank — the plan never contains Exchange SinglePartition) over the
    customer-grain base, then one hash aggregate on the code. Recency
    'descending' is scored by tiling the negated day count, so all three
    tiles share the ascending machinery. The anchor date is a fixed
    constant: scores are reproducible across loads, the usual RFM
    production requirement."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(RFM_ANCHOR), F.max(F.to_date("o_orderdate"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("monetary_cents"),
    ).withColumn("neg_recency", -F.col("recency_days"))
    scored = global_ntile(
        base, 5, ["neg_recency", "o_custkey"], tile_col="r_score"
    )
    scored = global_ntile(
        scored, 5, ["frequency", "o_custkey"], tile_col="f_score"
    )
    scored = global_ntile(
        scored, 5, ["monetary_cents", "o_custkey"], tile_col="m_score"
    )
    return (
        scored.select(
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            )
            .cast("long")
            .alias("rfm_code"),
            "monetary_cents",
            "o_custkey",
        )
        .groupBy("rfm_code")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("segment_cents"),
            F.min("o_custkey").cast("long").alias("sample_custkey"),
        )
        .orderBy("rfm_code")
    )


@register(
    "duplicate_order_detection",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(floor(o_totalprice / {DUP_ORDER_BAND}) AS BIGINT) AS band,
               CAST(o_orderdate AS DATE) AS day
        FROM orders
    )
    SELECT a.o_custkey,
           a.o_orderkey AS order_a,
           b.o_orderkey AS order_b,
           a.band,
           CAST(abs(date_diff('day', a.day, b.day)) AS BIGINT) AS day_gap
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.band = b.band
     AND a.o_orderkey < b.o_orderkey
    WHERE abs(date_diff('day', a.day, b.day)) <= {DUP_ORDER_WINDOW_DAYS}
    ORDER BY a.o_custkey, order_a, order_b
    """,
    doc="Double-billing / duplicate-submission detection: pairs of "
    "orders from the same customer whose totals fall in the same "
    f"{DUP_ORDER_BAND}-unit amount band within {DUP_ORDER_WINDOW_DAYS} "
    "days of each other — the standard AP-audit fraud probe, as an "
    "equi-join on (customer, amount band) with the date window applied "
    "as a residual filter.",
)
def duplicate_order_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the self-join key is (custkey, amount band) — highly
    selective, so candidate pairs are tiny versus orders²; the date
    window is a cheap residual predicate after the hash join, never a
    range-join condition. Skew guard: a pathological amount (e.g. a
    fixed subscription fee) fattens one key — the salted-join operator
    (operators/skew.py) drops in for that case."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") / DUP_ORDER_BAND)
        .cast("long")
        .alias("band"),
        F.to_date("o_orderdate").alias("day"),
    )
    a = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("order_a"),
        "band",
        F.col("day").alias("day_a"),
    )
    b = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("order_b"),
        "band",
        F.col("day").alias("day_b"),
    )
    return (
        a.join(b, ["o_custkey", "band"])
        .filter(F.col("order_a") < F.col("order_b"))
        .filter(
            F.abs(F.datediff("day_a", "day_b")) <= DUP_ORDER_WINDOW_DAYS
        )
        .select(
            "o_custkey",
            "order_a",
            "order_b",
            "band",
            F.abs(F.datediff("day_a", "day_b")).cast("long").alias("day_gap"),
        )
        .orderBy("o_custkey", "order_a", "order_b")
    )


@register(
    "ship_delay_percentiles",
    oracle="""
    WITH delays AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    hist AS (
        SELECT priority, delay_days, CAST(COUNT(*) AS BIGINT) AS c
        FROM delays GROUP BY 1, 2
    ),
    cum AS (
        SELECT priority, delay_days, c,
               SUM(c) OVER (PARTITION BY priority ORDER BY delay_days
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(c) OVER (PARTITION BY priority) AS n
        FROM hist
    )
    SELECT priority,
           CAST(MIN(n) AS BIGINT) AS n_lines,
           CAST(MIN(CASE WHEN cw * 2 >= n THEN delay_days END) AS BIGINT) AS p50,
           CAST(MIN(CASE WHEN cw * 10 >= 9 * n THEN delay_days END) AS BIGINT) AS p90,
           CAST(MIN(CASE WHEN cw * 100 >= 99 * n THEN delay_days END) AS BIGINT) AS p99,
           CAST(MAX(delay_days) AS BIGINT) AS max_delay
    FROM cum
    GROUP BY priority
    ORDER BY priority
    """,
    doc="Exact p50/p90/p99 order-to-ship delay per order priority — the "
    "SLA latency report — computed from a bounded-domain day histogram "
    "(integer cumulative compare), so the exact percentile never sorts "
    "fact-grain rows.",
)
def ship_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: fact rows collapse FIRST to a (priority × delay-day)
    histogram — bounded by the day domain (a few thousand cells), not by
    |lineitem| — and the percentile scan is a window over that tiny
    histogram. This is how exact latency percentiles stay cheap at
    100 TB: aggregate to the value domain, then rank the domain. The
    join is lineitem⋈orders on orderkey (both sides bucketable on the
    warehouse layout)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delays = li.join(
        orders.select("o_orderkey", "o_orderpriority", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "delay_days"
        ),
    )
    hist = delays.groupBy("priority", "delay_days").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("delay_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("priority")
    cum = hist.select(
        "priority",
        "delay_days",
        F.sum("c").over(wcum).alias("cw"),
        F.sum("c").over(wall).alias("n"),
    )
    return (
        cum.groupBy("priority")
        .agg(
            F.min("n").cast("long").alias("n_lines"),
            F.min(F.when(F.col("cw") * 2 >= F.col("n"), F.col("delay_days")))
            .cast("long")
            .alias("p50"),
            F.min(
                F.when(F.col("cw") * 10 >= 9 * F.col("n"), F.col("delay_days"))
            )
            .cast("long")
            .alias("p90"),
            F.min(
                F.when(F.col("cw") * 100 >= 99 * F.col("n"), F.col("delay_days"))
            )
            .cast("long")
            .alias("p99"),
            F.max("delay_days").cast("long").alias("max_delay"),
        )
        .orderBy("priority")
    )


@register(
    "ivm_retractable_aggregate",
    oracle="""
    WITH last_m AS (
        SELECT CAST(strftime(MAX(o_orderdate), '%Y%m') AS INT) AS lastm FROM orders
    ),
    mm AS (
        -- busiest month EXCLUDING the last calendar month: the changelog
        -- retracts all of last month, and restating into a fully
        -- retracted month would make the two formulations diverge on
        -- the zero-count group (ADVICE r3)
        SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS busy
        FROM orders, last_m
        WHERE CAST(strftime(o_orderdate, '%Y%m') AS INT) <> last_m.lastm
        GROUP BY 1, last_m.lastm ORDER BY COUNT(*) DESC, busy DESC LIMIT 1
    ),
    post AS (
        -- survivors: drop every order of the LAST calendar month, and the
        -- %3==0 orders of the busiest month
        SELECT o_orderkey, o_orderdate, CAST(o_totalprice AS DECIMAL(18,4)) AS price
        FROM orders, mm, last_m
        WHERE CAST(strftime(o_orderdate, '%Y%m') AS INT) <> last_m.lastm
          AND NOT (CAST(strftime(o_orderdate, '%Y%m') AS INT) = mm.busy
                   AND o_orderkey % 3 = 0)
        UNION ALL
        -- inserted restatement copies in the busiest month
        SELECT o_orderkey + 1000000000, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 2 AS DECIMAL(18,4))
        FROM orders, mm
        WHERE CAST(strftime(o_orderdate, '%Y%m') AS INT) = mm.busy
          AND o_orderkey % 3 = 0
    )
    SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
    FROM post GROUP BY 1
    """,
    doc="RETRACTABLE incremental view maintenance: the monthly revenue "
    "summary advanced by a changelog containing both deletes (signed "
    "−1 rows: the whole last calendar month, plus every 3rd order of "
    "the busiest month) and inserts (+1 restatement copies at double "
    "price) — signed counts and signed decimal sums merge with the "
    "prior summary, and groups whose count reaches zero are REMOVED, "
    "not left as ghost rows. Oracle is the full recompute of the "
    "post-changelog state.",
)
def ivm_retractable_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delta algebra every streaming materialized view runs on
    (Flink/Materialize retraction streams): SUM and COUNT are abelian —
    apply ±deltas at summary grain, never rescan the base. O(changelog)
    work per refresh; exact because the measures stay DECIMAL through
    the merge and zero-groups are dropped by an explicit filter (the
    invariant the oracle's recompute enforces by construction)."""
    orders = load_table(spark, sf_dir, "orders")
    month = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int")
    base = orders.select(
        month.alias("month"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
    )
    lastm = base.agg(F.max("month")).first()[0]
    # busiest month chosen OUTSIDE the fully-retracted last month, so the
    # restatement inserts never land in a group whose count nets to zero
    # (ADVICE r3: data-dependent divergence when busy == lastm)
    busy = (
        base.filter(F.col("month") != lastm)
        .groupBy("month")
        .count()
        .orderBy(F.desc("count"), F.desc("month"))
        .first()["month"]
    )

    retract_last = base.filter(F.col("month") == lastm).select(
        "month", F.lit(-1).alias("op"), "price"
    )
    busy_third = orders.filter(
        (month == busy) & (F.col("o_orderkey") % 3 == 0)
    ).select(
        month.alias("month"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
    )
    retract_busy = busy_third.select("month", F.lit(-1).alias("op"), "price")
    insert_busy = busy_third.select(
        "month",
        F.lit(1).alias("op"),
        (F.col("price") * 2).cast("decimal(18,4)").alias("price"),
    )
    changelog = retract_last.unionByName(retract_busy).unionByName(insert_busy)

    prior = base.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").alias("rev_dec"),
    )
    delta = changelog.groupBy("month").agg(
        F.sum("op").cast("bigint").alias("n_orders"),
        F.sum(F.col("op") * F.col("price")).cast(prior.schema["rev_dec"].dataType).alias("rev_dec"),
    )
    merged = (
        prior.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("rev_dec").alias("rev_dec"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return merged.select(
        "month", "n_orders", F.col("rev_dec").cast("double").alias("revenue")
    )


@register(
    "seasonal_naive_backtest",
    oracle="""
    WITH m AS (
        SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    )
    SELECT a.month,
           a.cents AS actual_cents,
           f.cents AS forecast_cents,
           CAST(abs(a.cents - f.cents) AS BIGINT) AS abs_err_cents
    FROM m a JOIN m f ON f.month = a.month - 100
    """,
    doc="Seasonal-naive forecast backtest: each month's revenue predicted "
    "by the same month one year earlier, scored by absolute error in "
    "exact integer cents — the baseline every real forecasting model "
    "must beat, and the first number a demand-planning evaluation "
    "reports. Joining month = month−100 on yyyyMM keys is exact calendar "
    "arithmetic (same-month-prior-year), no date intervals involved.",
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape: one fact aggregate to month grain, then a month-grain
    self-join (~80 rows) — the backtest costs nothing beyond the rollup
    at any scale. The anti-pattern it replaces is a 12-row lag window
    over an unpartitioned month sort; the equi-join form needs no global
    ordering at all and extends to per-store/per-SKU grain by adding the
    key to both sides (still one shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    f = m.select((F.col("month") + 100).alias("month"), F.col("cents").alias("forecast_cents"))
    return (
        m.join(f, "month")
        .select(
            "month",
            F.col("cents").alias("actual_cents"),
            "forecast_cents",
            F.abs(F.col("cents") - F.col("forecast_cents"))
            .cast("bigint")
            .alias("abs_err_cents"),
        )
    )


@register(
    "fx_effective_rate_normalize",
    oracle="""
    WITH months AS (
        SELECT DISTINCT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month
        FROM orders
    ),
    rates AS (
        -- effective-dated rate table: a new rate every 3rd calendar month
        SELECT n.n_nationkey AS nationkey, m.month AS eff_month,
               CAST(1000000 + n.n_nationkey * 1000 + (m.month % 7) * 100
                    AS BIGINT) AS rate_ppm
        FROM nation n CROSS JOIN months m
        WHERE m.month % 3 = 0
    ),
    grid AS (
        SELECT n.n_nationkey AS nationkey, m.month,
               (SELECT r.rate_ppm FROM rates r
                WHERE r.nationkey = n.n_nationkey AND r.eff_month <= m.month
                ORDER BY r.eff_month DESC LIMIT 1) AS rate_ppm
        FROM nation n CROSS JOIN months m
    )
    SELECT c.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT) * g.rate_ppm)
                AS BIGINT) AS normalized_ppm_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN grid g ON g.nationkey = c.c_nationkey
              AND g.month = CAST(strftime(o.o_orderdate, '%Y%m') AS INT)
    WHERE g.rate_ppm IS NOT NULL
    GROUP BY 1
    """,
    doc="Effective-dated rate normalization: a synthetic FX table posts a "
    "new per-nation rate every 3rd month; each order is converted at the "
    "latest rate effective on or before its month, in exact integer "
    "ppm·cents. Orders before a nation's first posted rate are excluded "
    "(no rate in effect). The standard currency/price-list/effective-"
    "dated-dimension lookup of every multinational warehouse.",
)
def fx_effective_rate_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale pattern — DENSIFY, don't range-join: the naive formulation
    (fact ⋈ rates ON eff_month <= order_month, rank desc, keep first) is
    a per-row range join Spark executes as BNLJ + window. Instead the
    bounded (nation × month) grid is densified once — carry the last
    posted rate forward with a grid-sized window — and the FACT side
    does one hash equi-join on (nation, month). Grid work is
    |nations|·|months| rows regardless of fact size; the fact path has
    zero windows and zero inequality joins. Same recipe for price
    lists, tax tables, and SCD lookups at daily grain."""
    from pyspark.sql.window import Window as _W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    month = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int")
    months = orders.select(month.alias("month")).distinct()
    grid = nation.select(F.col("n_nationkey").alias("nationkey")).crossJoin(
        F.broadcast(months)
    )
    rate = F.when(
        F.col("month") % 3 == 0,
        (1000000 + F.col("nationkey") * 1000 + (F.col("month") % 7) * 100).cast(
            "bigint"
        ),
    )
    w = (
        _W.partitionBy("nationkey")
        .orderBy("month")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    dense = grid.withColumn("posted", rate).withColumn(
        "rate_ppm", F.last("posted", ignorenulls=True).over(w)
    ).filter(F.col("rate_ppm").isNotNull()).select("nationkey", "month", "rate_ppm")

    fact = orders.join(
        cust.select(
            F.col("c_custkey").alias("o_custkey"),
            F.col("c_nationkey").alias("nationkey"),
        ),
        "o_custkey",
    ).select(
        "nationkey",
        month.alias("month"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return (
        fact.join(F.broadcast(dense), ["nationkey", "month"])
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("cents") * F.col("rate_ppm"))
            .cast("bigint")
            .alias("normalized_ppm_cents"),
        )
    )


@register(
    "open_order_aging_buckets",
    oracle="""
    WITH anchor AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    aged AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               date_diff('day', o_orderdate, a.maxd) AS age_days
        FROM orders o CROSS JOIN anchor a
        WHERE o.o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 60 THEN '31-60'
                WHEN age_days <= 90 THEN '61-90'
                ELSE '90+' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS open_cents
    FROM aged GROUP BY 1
    """,
    doc="Open-order aging report: orders still in status 'O' bucketed by "
    "days outstanding relative to the dataset's anchor date (0-30 / "
    "31-60 / 61-90 / 90+), with exact open cents per bucket — the "
    "receivables-aging shape every finance close runs, anchored to a "
    "data-derived date so the result is reproducible (SURVEY R9: never "
    "now() inside a transform).",
)
def open_order_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scalar anchor broadcast, one pass, a 4-row rollup; the bucket
    CASE is codegen'd. The datediff is calendar-day exact on both
    engines (DATE-truncated timestamps, UTC session)."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("maxd"))
    aged = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            F.datediff(F.to_date("maxd"), F.to_date("o_orderdate")).alias(
                "age_days"
            ),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 60, "31-60")
        .when(F.col("age_days") <= 90, "61-90")
        .otherwise("90+")
    )
    return aged.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("bigint").alias("open_cents"),
    )


@register(
    "supplier_concentration_hhi",
    oracle="""
    WITH share AS (
        SELECT p.p_brand, l.l_suppkey,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT p_brand, CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM share GROUP BY 1
    )
    SELECT s.p_brand AS brand, t.n_suppliers, t.total_cents,
           CAST(SUM(CAST(s.cents AS DECIMAL(19,0)) * CAST(s.cents AS DECIMAL(19,0)))
                AS DOUBLE)
               / (CAST(t.total_cents AS DOUBLE) * t.total_cents) AS hhi
    FROM share s JOIN tot t ON s.p_brand = t.p_brand
    GROUP BY 1, 2, 3
    """,
    doc="Supplier-concentration Herfindahl index per brand: Σ(share²) "
    "over supplier revenue shares, computed as Σ(cents²)/total² so the "
    "numerator and denominator are exact integer products and only one "
    "final division is floating — HHI near 1 flags single-supplier risk, "
    "near 1/n a balanced base. The procurement-risk metric, bit-stable.",
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: fact aggregated once to (brand, supplier) grain; the HHI is
    a grain-to-grain re-aggregation with exact integer squares (cents ≤
    ~1e9 per cell → square ≤ 1e18, inside BIGINT; the Σ of squares
    accumulates in DECIMAL(38,0) — cents² at warehouse scale overflows
    the 2^53 exact-double range, so a float sum would be
    addition-order-dependent). No windows, two shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    share = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    tot = share.groupBy("brand").agg(
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return (
        share.join(tot, "brand")
        .groupBy("brand", "n_suppliers", "total_cents")
        .agg(
            (
                F.sum(
                    F.col("cents").cast("decimal(19,0)")
                    * F.col("cents").cast("decimal(19,0)")
                ).cast("double")
                / (F.col("total_cents").cast("double") * F.col("total_cents"))
            ).alias("hhi")
        )
    )


@register(
    "basket_size_distribution",
    oracle="""
    WITH sizes AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS basket_cents
        FROM lineitem GROUP BY 1
    )
    SELECT n_lines AS basket_size,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(basket_cents) AS BIGINT) AS total_cents
    FROM sizes GROUP BY 1
    """,
    doc="Basket-size distribution: orders histogrammed by line count with "
    "exact revenue mass per size — the merchandising curve (is revenue "
    "in big baskets or many small ones?) as a two-level re-aggregation, "
    "no windows.",
)
def basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("basket_cents"),
    )
    return sizes.groupBy(F.col("n_lines").alias("basket_size")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("basket_cents").cast("bigint").alias("total_cents"),
    )


@register(
    "line_sequence_integrity_audit",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(l_linenumber) AS BIGINT) AS max_ln,
               CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln,
               CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_distinct
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN max_ln = n AND n_distinct = n
                          AND 2 * sum_ln = n * (n + 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contiguous,
           CAST(SUM(CASE WHEN n_distinct < n THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_duplicates,
           CAST(SUM(CASE WHEN max_ln > n THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_gaps
    FROM per_order
    """,
    doc="Line-number integrity audit: per order, l_linenumber must be a "
    "contiguous 1..n sequence — verified arithmetically (max = count, "
    "all distinct, Gauss sum 2·Σ = n(n+1)) without sorting anything; "
    "duplicate and gap counts split out. The child-sequence invariant "
    "every order/invoice loader should assert before trusting "
    "line-grain joins.",
)
def line_sequence_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gauss-sum trick turns 'is this a permutation of 1..n' into
    three aggregates — no per-order sort, no window, one shuffle on the
    order key then a single-row report."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("l_linenumber").cast("bigint").alias("max_ln"),
        F.sum("l_linenumber").cast("bigint").alias("sum_ln"),
        F.countDistinct("l_linenumber").alias("n_distinct"),
    )
    contiguous = (
        (F.col("max_ln") == F.col("n"))
        & (F.col("n_distinct") == F.col("n"))
        & (2 * F.col("sum_ln") == F.col("n") * (F.col("n") + 1))
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(contiguous.cast("int")).cast("bigint").alias("n_contiguous"),
        F.sum((F.col("n_distinct") < F.col("n")).cast("int"))
        .cast("bigint")
        .alias("n_with_duplicates"),
        F.sum((F.col("max_ln") > F.col("n")).cast("int"))
        .cast("bigint")
        .alias("n_with_gaps"),
    )


@register(
    "single_source_parts_risk",
    oracle="""
    WITH sup_counts AS (
        SELECT l_partkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_sup
        FROM lineitem GROUP BY 1
    )
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts_traded,
           CAST(SUM(CASE WHEN s.n_sup = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_single_source,
           CAST(SUM(CASE WHEN s.n_sup = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS single_source_share
    FROM sup_counts s JOIN part p ON s.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    doc="Single-point-of-failure sourcing risk: per brand, how many "
    "traded parts have exactly ONE observed supplier — the complement "
    "to the HHI concentration index (HHI says revenue is concentrated; "
    "this names the parts where a single supplier outage stops the "
    "line). One distinct-count aggregate, one dimension join, exact "
    "counts with a single final ratio.",
)
def single_source_parts_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup_counts = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_sup")
    )
    return (
        sup_counts.join(
            F.broadcast(part), sup_counts["l_partkey"] == part["p_partkey"]
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_parts_traded"),
            F.sum((F.col("n_sup") == 1).cast("int"))
            .cast("bigint")
            .alias("n_single_source"),
        )
        .withColumn(
            "single_source_share",
            F.col("n_single_source").cast("double") / F.col("n_parts_traded"),
        )
    )


@register(
    "discount_depth_response",
    oracle="""
    SELECT CAST(round(l_discount * 100) AS INT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS units,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / COUNT(*)
               AS units_per_line,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS net_cents
    FROM lineitem GROUP BY 1
    """,
    doc="Discount-depth response table: per discount percentage point, "
    "line count, exact units moved, units per line, and net revenue in "
    "exact cents — the raw elasticity read (does depth move volume or "
    "just give margin away?) with every aggregate integer-exact and the "
    "single ratio divided last.",
)
def discount_depth_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.round(F.col("l_discount") * 100).cast("int").alias("discount_pct")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.round("l_quantity").cast("bigint")).cast("bigint").alias("units"),
        (
            F.sum(F.round("l_quantity").cast("bigint")).cast("double")
            / F.count(F.lit(1))
        ).alias("units_per_line"),
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        )
        .cast("bigint")
        .alias("net_cents"),
    )


@register(
    "returns_rate_by_brand",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returned,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                         THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS returned_cents,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS return_rate
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    doc="Returns rate per brand: returned-line share and exact returned "
    "revenue — the post-sale quality signal merchandising watches; a "
    "brand whose return_rate spikes relative to peers flags a defect or "
    "listing problem long before reviews do.",
)
def returns_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ret = F.col("l_returnflag") == "R"
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(ret.cast("int")).cast("bigint").alias("n_returned"),
            F.sum(
                F.when(
                    ret, F.round(F.col("l_extendedprice") * 100).cast("bigint")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("returned_cents"),
            (F.sum(ret.cast("int")).cast("double") / F.count(F.lit(1))).alias(
                "return_rate"
            ),
        )
    )


#: SLA days per order priority class (1-URGENT tightest).
SLA_DAYS = {"1-URGENT": 30, "2-HIGH": 45, "3-MEDIUM": 60, "4-NOT SPECIFIED": 90, "5-LOW": 120}

_SLA_VALUES = ", ".join(f"('{k}', {v})" for k, v in sorted(SLA_DAYS.items()))


@register(
    "priority_sla_compliance",
    oracle=f"""
    WITH sla(priority, sla_days) AS (VALUES {_SLA_VALUES}),
    delays AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT d.priority, s.sla_days,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN d.delay_days <= s.sla_days
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_sla,
           CAST(SUM(CASE WHEN d.delay_days <= s.sla_days
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS compliance_rate
    FROM delays d JOIN sla s ON d.priority = s.priority
    GROUP BY 1, 2
    """,
    doc="SLA compliance per priority class: order-to-ship delay compared "
    "against a per-priority service-level table (a 5-row broadcast "
    "literal — the contract, versioned with the code), with exact "
    "within-SLA counts and one final rate division. The ops scoreboard "
    "over the same delay measure ship_delay_percentiles profiles.",
)
def priority_sla_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sla = spark.createDataFrame(
        sorted(SLA_DAYS.items()), "priority STRING, sla_days INT"
    )
    delays = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "delay_days"
        ),
    )
    within = F.col("delay_days") <= F.col("sla_days")
    return (
        delays.join(F.broadcast(sla), "priority")
        .groupBy("priority", "sla_days")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(within.cast("int")).cast("bigint").alias("n_within_sla"),
            (F.sum(within.cast("int")).cast("double") / F.count(F.lit(1))).alias(
                "compliance_rate"
            ),
        )
    )


CHURN_INACTIVE_DAYS = 180


@register(
    "churn_risk_by_segment",
    oracle=f"""
    WITH anchor AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    last_order AS (
        SELECT o_custkey, MAX(o_orderdate) AS last_dt
        FROM orders GROUP BY 1
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_active_customers,
           CAST(SUM(CASE WHEN date_diff('day', lo.last_dt, a.maxd)
                              > {CHURN_INACTIVE_DAYS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_at_risk,
           CAST(SUM(CASE WHEN date_diff('day', lo.last_dt, a.maxd)
                              > {CHURN_INACTIVE_DAYS}
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS at_risk_share
    FROM last_order lo
    JOIN customer c ON lo.o_custkey = c.c_custkey
    CROSS JOIN anchor a
    GROUP BY 1
    """,
    doc=f"Churn-risk flags: customers whose last order is more than "
    f"{CHURN_INACTIVE_DAYS} days before the dataset anchor, rolled up per "
    "market segment — the inactivity definition behind every retention "
    "campaign list, anchored to a data-derived date (SURVEY R9) so the "
    "risk set is reproducible.",
)
def churn_risk_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    anchor = orders.agg(F.max("o_orderdate").alias("maxd"))
    last_order = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_dt")
    )
    at_risk = (
        F.datediff(F.to_date("maxd"), F.to_date("last_dt")) > CHURN_INACTIVE_DAYS
    )
    return (
        last_order.join(
            cust.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"),
            ),
            "o_custkey",
        )
        .crossJoin(F.broadcast(anchor))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_active_customers"),
            F.sum(at_risk.cast("int")).cast("bigint").alias("n_at_risk"),
            (F.sum(at_risk.cast("int")).cast("double") / F.count(F.lit(1))).alias(
                "at_risk_share"
            ),
        )
    )


@register(
    "nation_trade_balance",
    oracle="""
    WITH exports AS (
        SELECT s.s_nationkey AS nationkey,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS export_cents
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1
    ),
    imports AS (
        SELECT c.c_nationkey AS nationkey,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS import_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    )
    SELECT n.n_name AS nation,
           COALESCE(e.export_cents, 0) AS export_cents,
           COALESCE(i.import_cents, 0) AS import_cents,
           CAST(COALESCE(e.export_cents, 0) - COALESCE(i.import_cents, 0)
                AS BIGINT) AS balance_cents
    FROM nation n
    LEFT JOIN exports e ON n.n_nationkey = e.nationkey
    LEFT JOIN imports i ON n.n_nationkey = i.nationkey
    """,
    doc="Nation trade balance: supply-side revenue (lineitems via the "
    "supplier's nation) against demand-side spend (orders via the "
    "customer's nation), exact signed cents — the two-fact-one-dimension "
    "shape where each fact aggregates to the dimension grain FIRST and "
    "the dimension joins two summary tables, never fact-to-fact.",
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-to-fact join trap this avoids: joining lineitem to orders
    on nation would explode rows and double-count; aggregating each fact
    to nation grain first makes the final join 25×25. Same pattern as
    customer_order_reconciliation, at dimension grain."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    exports = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("export_cents")
        )
    )
    imports = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("import_cents")
        )
    )
    return (
        nation.join(exports, nation["n_nationkey"] == exports["nationkey"], "left")
        .drop("nationkey")
        .join(imports, nation["n_nationkey"] == imports["nationkey"], "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("export_cents", F.lit(0)).alias("export_cents"),
            F.coalesce("import_cents", F.lit(0)).alias("import_cents"),
            (
                F.coalesce("export_cents", F.lit(0))
                - F.coalesce("import_cents", F.lit(0))
            )
            .cast("bigint")
            .alias("balance_cents"),
        )
    )


@register(
    "repeat_purchase_intervals",
    oracle="""
    WITH gaps AS (
        SELECT c.c_mktsegment AS segment,
               date_diff('day',
                   lag(o.o_orderdate) OVER (
                       PARTITION BY o.o_custkey
                       ORDER BY o.o_orderdate, o.o_orderkey
                   ),
                   o.o_orderdate) AS gap_days
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT segment,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_days) AS BIGINT) AS sum_gap_days,
           CAST(median(gap_days) AS DOUBLE) AS median_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY 1
    """,
    doc="Repeat-purchase cadence per market segment: day gaps between a "
    "customer's consecutive orders (customer-partitioned lag, unique "
    "tie-break on order key), with exact gap count/sum and the exact "
    "median — the replenishment-cycle input for campaign timing and the "
    "order-grain twin of event_gap_stats.",
)
def repeat_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window partitions by customer — millions of small partitions,
    the shape window functions scale on (never a global sort); the
    median is exact over integer day counts (even-count midpoints are
    .5-exact in binary on both engines)."""
    from pyspark.sql.window import Window as _W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = _W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("o_custkey"),
                    F.col("c_mktsegment").alias("segment"),
                )
            ),
            "o_custkey",
        )
        .withColumn(
            "gap_days",
            F.datediff(
                F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
            ),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_days").cast("bigint").alias("sum_gap_days"),
        F.expr("percentile(gap_days, 0.5)").alias("median_gap_days"),
    )


@register(
    "supplier_lead_time_consistency",
    oracle="""
    WITH delays AS (
        SELECT l.l_suppkey,
               CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                   AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           CAST(SUM(d.d) AS BIGINT) AS sum_days,
           CAST(SUM(d.d * d.d) AS BIGINT) AS sum_days_sq,
           CAST(MIN(d.d) AS BIGINT) AS min_days,
           CAST(MAX(d.d) AS BIGINT) AS max_days
    FROM delays d JOIN supplier s ON d.l_suppkey = s.s_suppkey
    GROUP BY 1
    """,
    doc="Supplier lead-time consistency by nation: exact integer moments "
    "(n, Σd, Σd²) plus range of the order-to-ship delay — mean and "
    "variance fall out arithmetically, and publishing moments instead "
    "of a float variance keeps the reliability score bit-stable (the "
    "CUPED/chi-square discipline). A supplier pool with a tight range "
    "but fat Σd² has outlier lanes worth auditing.",
)
def supplier_lead_time_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    delays = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_suppkey",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("d"),
    )
    return (
        delays.join(
            F.broadcast(
                sup.select(
                    F.col("s_suppkey").alias("l_suppkey"),
                    F.col("s_nationkey").alias("nationkey"),
                )
            ),
            "l_suppkey",
        )
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.sum("d").cast("bigint").alias("sum_days"),
            F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sum_days_sq"),
            F.min("d").cast("bigint").alias("min_days"),
            F.max("d").cast("bigint").alias("max_days"),
        )
    )


@register(
    "dow_order_volume_profile",
    oracle="""
    SELECT CAST(dayofweek(o_orderdate) AS INT) AS dow_sun0,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 100.0 AS avg_order_value
    FROM orders GROUP BY 1
    """,
    doc="Day-of-week order profile: volume, exact revenue cents, and "
    "average order value per weekday — the staffing/promo-calendar "
    "seasonality read. DOW is normalized to DuckDB's 0=Sunday "
    "convention on the Spark side (Spark's dayofweek is 1=Sunday), the "
    "cross-engine calendar trap activity_heatmap_dow_hour documents.",
)
def dow_order_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return orders.groupBy(
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow_sun0")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).cast("bigint").alias("revenue_cents"),
        (F.sum(cents).cast("double") / F.count(F.lit(1)) / 100.0).alias(
            "avg_order_value"
        ),
    )


@register(
    "rolling_quarter_active_customers",
    oracle="""
    WITH active AS (
        SELECT DISTINCT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
               o_custkey
        FROM orders
    ),
    months AS (SELECT DISTINCT month FROM active),
    scattered AS (
        -- a customer active in month m counts toward windows ending at
        -- m, m+1, m+2 (calendar-correct month arithmetic)
        SELECT ((month // 100) * 12 + (month % 100) - 1 + k) AS mix,
               o_custkey
        FROM active CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    )
    SELECT m.month,
           CAST((SELECT COUNT(DISTINCT a.o_custkey) FROM active a
                 WHERE a.month = m.month) AS BIGINT) AS mau,
           CAST(COUNT(DISTINCT s.o_custkey) AS BIGINT) AS rolling_q_active
    FROM months m
    JOIN scattered s
      ON s.mix = (m.month // 100) * 12 + (m.month % 100) - 1
    GROUP BY 1
    """,
    doc="Monthly active customers plus the rolling-3-month active count: "
    "the windowed COUNT(DISTINCT) no window frame can express is "
    "re-expressed as a SCATTER — each (month, customer) activity row "
    "contributes to the three windows it belongs to (month-index "
    "arithmetic handles year boundaries), then one exact distinct count "
    "per window. The same inversion as ewma_daily_orders: turn a "
    "range-lookback into an equi-join fan-out.",
)
def rolling_quarter_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact where the HLL twin (rolling_7day_distinct_hll) is
    approximate: the scatter multiplies rows by the window length (3×
    month-grain activity pairs — tiny), and COUNT(DISTINCT) runs as the
    standard two-phase exact distinct. Window length is a constant fan-
    out, so cost scales with activity rows, not fact rows."""
    orders = load_table(spark, sf_dir, "orders")
    active = orders.select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("month"),
        "o_custkey",
    ).distinct()
    mix = (F.col("month") / 100).cast("int") * 12 + (F.col("month") % 100) - 1
    scattered = active.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
        (mix + F.col("k")).alias("mix"),
        "o_custkey",
    )
    months = active.select("month").distinct().withColumn("mix", mix)
    mau = active.groupBy("month").agg(
        F.countDistinct("o_custkey").alias("mau")
    )
    rolling = (
        months.join(scattered, "mix")
        .groupBy("month")
        .agg(F.countDistinct("o_custkey").alias("rolling_q_active"))
    )
    return mau.join(rolling, "month").select(
        "month", "mau", "rolling_q_active"
    )


@register(
    "new_vs_returning_revenue",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey, MIN(o_orderdate) AS first_dt FROM orders GROUP BY 1
    )
    SELECT CAST(strftime(o.o_orderdate, '%Y%m') AS INT) AS month,
           CAST(SUM(CASE WHEN o.o_orderdate = f.first_dt THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new_orders,
           CAST(SUM(CASE WHEN o.o_orderdate > f.first_dt THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning_orders,
           CAST(SUM(CASE WHEN o.o_orderdate = f.first_dt
                         THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS new_cents,
           CAST(SUM(CASE WHEN o.o_orderdate > f.first_dt
                         THEN CAST(round(o.o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS returning_cents
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY 1
    """,
    doc="New-vs-returning revenue split per month: an order is 'new' on "
    "the customer's first order DATE (ties on the same day all count as "
    "new — the deterministic convention; ranking within a day would "
    "need an arbitrary tie-break), exact cents both sides. The "
    "growth-accounting read that separates acquisition from retention "
    "revenue.",
)
def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One min-date aggregate to customer grain, one fact join back on
    the customer key, one month rollup — the first-seen collapse shape
    (cumulative_distinct_users) applied to revenue attribution."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    is_new = F.col("o_orderdate") == F.col("first_dt")
    is_ret = F.col("o_orderdate") > F.col("first_dt")
    return (
        orders.join(firsts, "o_custkey")
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("int")
            .alias("month")
        )
        .agg(
            F.sum(is_new.cast("int")).cast("bigint").alias("n_new_orders"),
            F.sum(is_ret.cast("int")).cast("bigint").alias("n_returning_orders"),
            F.sum(F.when(is_new, cents).otherwise(0))
            .cast("bigint")
            .alias("new_cents"),
            F.sum(F.when(is_ret, cents).otherwise(0))
            .cast("bigint")
            .alias("returning_cents"),
        )
    )


@register(
    "top_customer_dependence",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey AS nationkey,
               o.o_custkey,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MAX(cents) AS BIGINT) AS top_customer_cents,
           CAST(SUM(cents) AS BIGINT) AS nation_cents,
           CAST(MAX(cents) AS DOUBLE) / SUM(cents) AS top_share
    FROM spend GROUP BY 1
    """,
    doc="Largest-customer dependence per nation: the top customer's exact "
    "spend against the nation total with a single final ratio — the "
    "key-account concentration risk (a nation whose top_share nears 1 "
    "is one churn away from losing the market), complementing the "
    "supplier-side HHI with the demand-side tail risk.",
)
def top_customer_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("o_custkey"),
                    F.col("c_nationkey").alias("nationkey"),
                )
            ),
            "o_custkey",
        )
        .groupBy("nationkey", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    return spend.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.max("cents").cast("bigint").alias("top_customer_cents"),
        F.sum("cents").cast("bigint").alias("nation_cents"),
        (F.max("cents").cast("double") / F.sum("cents")).alias("top_share"),
    )


@register(
    "backup_supplier_coverage",
    oracle="""
    WITH sup_counts AS (
        SELECT l_partkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_sup,
               MIN(l_suppkey) AS sole_supp
        FROM lineitem GROUP BY 1
    ),
    singles AS (
        SELECT s.l_partkey AS partkey, s.sole_supp, p.p_type, p.p_size
        FROM sup_counts s JOIN part p ON s.l_partkey = p.p_partkey
        WHERE s.n_sup = 1
    ),
    alt AS (
        SELECT DISTINCT sg.partkey, l.l_suppkey AS alt_supp
        FROM singles sg
        JOIN part p2 ON p2.p_type = sg.p_type AND p2.p_size = sg.p_size
                    AND p2.p_partkey <> sg.partkey
        JOIN lineitem l ON l.l_partkey = p2.p_partkey
        WHERE l.l_suppkey <> sg.sole_supp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_single_source_parts,
           CAST(SUM(CASE WHEN a.n_alt > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_backup,
           CAST(SUM(COALESCE(a.n_alt, 0)) AS BIGINT) AS total_backup_options
    FROM singles sg
    LEFT JOIN (
        SELECT partkey, CAST(COUNT(*) AS BIGINT) AS n_alt FROM alt GROUP BY 1
    ) a ON sg.partkey = a.partkey
    """,
    doc="Backup-supplier coverage for the single-source parts: suppliers "
    "observed shipping OTHER parts of the same (type, size) are "
    "candidate alternates — how many at-risk parts have at least one, "
    "and how deep the bench is. The remediation view on top of "
    "single_source_parts_risk: the risk list says where the exposure "
    "is, this says which exposures are actually fixable from the "
    "existing supplier base.",
)
def backup_supplier_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape: the attribute-similarity join runs at PART grain (bounded
    dimension), never on the fact; lineitem touches only as two
    aggregate passes. The (type, size) equi-key is the blocking idiom
    again — candidate alternates come from an index-able key, not a
    catalog cross join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup_counts = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_sup"),
        F.min("l_suppkey").alias("sole_supp"),
    )
    singles = (
        sup_counts.filter(F.col("n_sup") == 1)
        .join(F.broadcast(part), sup_counts["l_partkey"] == part["p_partkey"])
        .select(
            F.col("l_partkey").alias("partkey"),
            "sole_supp",
            "p_type",
            "p_size",
        )
    )
    same_attr = part.select(
        F.col("p_partkey").alias("alt_partkey"), "p_type", "p_size"
    )
    alt = (
        singles.join(F.broadcast(same_attr), ["p_type", "p_size"])
        .filter(F.col("alt_partkey") != F.col("partkey"))
        .join(
            li.select(
                F.col("l_partkey").alias("alt_partkey"),
                F.col("l_suppkey").alias("alt_supp"),
            ).distinct(),
            "alt_partkey",
        )
        .filter(F.col("alt_supp") != F.col("sole_supp"))
        .select("partkey", "alt_supp")
        .distinct()
    )
    n_alt = alt.groupBy("partkey").agg(F.count(F.lit(1)).alias("n_alt"))
    return (
        singles.join(n_alt, "partkey", "left")
        .agg(
            F.count(F.lit(1)).alias("n_single_source_parts"),
            F.sum((F.coalesce("n_alt", F.lit(0)) > 0).cast("int"))
            .cast("bigint")
            .alias("n_with_backup"),
            F.sum(F.coalesce("n_alt", F.lit(0))).cast("bigint").alias(
                "total_backup_options"
            ),
        )
    )


@register(
    "trade_flow_matrix",
    oracle="""
    SELECT sn.n_name AS supplier_nation,
           cn.n_name AS customer_nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS flow_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY 1, 2
    """,
    doc="Trade-flow matrix: exact revenue cents from every supplier "
    "nation to every customer nation — the full |nations|² flow table "
    "whose row/column sums are nation_trade_balance's exports and "
    "imports (a reconciliation invariant between the two queries), and "
    "whose diagonal is domestic trade. TPC-H Q7's shape generalized "
    "from two nations to the complete matrix.",
)
def trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one legitimate fact-to-fact join in the family: lineitem to
    orders is parent-child on the order key (no fan-out beyond the
    child grain). Dimensions broadcast; the aggregate lands on a
    625-cell grid regardless of fact size."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("customer_nation"),
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supplier_nation"),
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(F.broadcast(cn), "c_nationkey")
        .join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(F.broadcast(sn), "s_nationkey")
        .groupBy("supplier_nation", "customer_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("flow_cents"),
        )
    )


@register(
    "part_trading_lifespan",
    oracle="""
    WITH spans AS (
        SELECT l_partkey,
               CAST(date_diff('day', MIN(l_shipdate), MAX(l_shipdate)) AS BIGINT)
                   AS span_days,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1
    )
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(s.span_days) AS BIGINT) AS sum_span_days,
           CAST(MAX(s.span_days) AS BIGINT) AS max_span_days,
           CAST(SUM(CASE WHEN s.n_lines = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_one_shot_parts
    FROM spans s JOIN part p ON s.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    doc="Part trading lifespan per brand: days between each part's first "
    "and last shipment (exact integer spans, summed and maxed per "
    "brand) plus the one-shot parts that traded exactly once — the "
    "assortment-lifecycle read distinguishing evergreen SKUs from "
    "one-and-done listings.",
)
def part_trading_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    spans = li.groupBy("l_partkey").agg(
        F.datediff(
            F.to_date(F.max("l_shipdate")), F.to_date(F.min("l_shipdate"))
        )
        .cast("bigint")
        .alias("span_days"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        spans.join(F.broadcast(part), spans["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("span_days").cast("bigint").alias("sum_span_days"),
            F.max("span_days").cast("bigint").alias("max_span_days"),
            F.sum((F.col("n_lines") == 1).cast("int"))
            .cast("bigint")
            .alias("n_one_shot_parts"),
        )
    )


@register(
    "autocorrelation_lags",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1
    ),
    lags AS (SELECT UNNEST([1, 2, 7, 30]) AS lag),
    pairs AS (
        SELECT l.lag, a.x AS x, b.x AS y
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d - to_days(CAST(l.lag AS INT))
    ),
    m AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS INT) AS lag, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS acf
    FROM m
    """,
    doc="Autocorrelation of the daily order-count series at lags 1, 2, 7 "
    "and 30 days — the ACF readout behind seasonality detection (the "
    "lag-7 spike is the weekly cycle test) and forecast-model order "
    "selection. Pearson r is computed from exact BIGINT moment sums "
    "(n·Σxy − ΣxΣy over the root product), the same engine-portable "
    "formulation as price_quantity_corr — corr() builtins disagree "
    "across engines at the last ulp.",
)
def autocorrelation_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape: one day-grain rollup (~2.4k rows at any sf — aggregation
    happens at the fact scan), then a lag equi-join per lag value on the
    TINY daily series and exact integer moment sums. The anti-pattern
    this replaces is windowing the raw fact by a 30-day frame (a fact-
    sized sort); here the fact is touched once, and the lag join costs
    four broadcast-sized probes. Gap semantics: missing days drop the
    pair (inner join) identically in both formulations."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    lags = literal_table(spark, [(1,), (2,), (7,), (30,)], "lag INT")
    b = daily.select(F.col("d").alias("d2"), F.col("x").alias("y"))
    pairs = (
        daily.crossJoin(broadcast_scalar(lags))
        .join(b, F.col("d2") == F.expr("date_sub(d, lag)"))
        .select("lag", "x", "y")
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return m.select(
        "lag",
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
        ).alias("acf"),
    )


@register(
    "attribution_multitouch",
    oracle="""
    WITH purchases AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts,
               CAST(round(value * 1000000) AS BIGINT) AS value_micros
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT event_id AS c_id, user_id, ts AS c_ts FROM events
        WHERE event_type = 'click'
    ),
    touch AS (
        SELECT p.p_id, p.value_micros, c.c_id,
               ROW_NUMBER() OVER (
                   PARTITION BY p.p_id ORDER BY c.c_ts, c.c_id
               ) AS pos,
               COUNT(*) OVER (PARTITION BY p.p_id) AS k
        FROM purchases p
        JOIN clicks c
          ON c.user_id = p.user_id
         AND c.c_ts <= p.p_ts
         AND c.c_ts >= p.p_ts - INTERVAL 7 DAY
    ),
    credited AS (
        SELECT c_id, value_micros,
               CASE WHEN k = 1 THEN 1000
                    WHEN k = 2 THEN 500
                    WHEN pos = 1 OR pos = k THEN 400
                    ELSE 200 // (k - 2)
               END AS permille
        FROM touch
    )
    SELECT CAST(c_id % 3 AS BIGINT) AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(value_micros * permille // 1000) AS BIGINT)
               AS credited_micros
    FROM credited GROUP BY 1
    """,
    doc="U-shaped multi-touch attribution: every purchase distributes "
    "credit over the user's clicks in the prior 7 days — sole touch "
    "100%, two touches 50/50, otherwise 40% first / 40% last / 20% "
    "split over the middles — rolled up per channel (click id mod 3 "
    "plays the channel). All credit arithmetic is integer permille over "
    "integer micros with truncating division, so the per-channel sums "
    "are exact BIGINTs — no order-dependent float accumulation.",
)
def attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the touch table is a per-user time-range join (shuffles on
    user_id, range-bounded by the 7-day window — state ∝ a user's week,
    never the history), then ONE window pass partitioned by purchase for
    position/count and a channel-grain rollup. The credit rule is a CASE
    arm away from any other position scheme (linear, time-decay with
    rational weights); keeping weights in integer permille is what lets
    an independent engine reproduce the report bit-for-bit."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("value_micros"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", F.col("ts").alias("c_ts")
    )
    touch = (
        purchases.join(clicks, "user_id")
        .filter(
            (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select("p_id", "value_micros", "c_id", "c_ts")
    )
    w = Window.partitionBy("p_id").orderBy("c_ts", "c_id")
    wk = Window.partitionBy("p_id")
    credited = (
        touch.withColumn("pos", F.row_number().over(w))
        .withColumn("k", F.count(F.lit(1)).over(wk))
        .withColumn(
            "permille",
            F.when(F.col("k") == 1, 1000)
            .when(F.col("k") == 2, 500)
            .when((F.col("pos") == 1) | (F.col("pos") == F.col("k")), 400)
            .otherwise(F.floor(F.lit(200) / (F.col("k") - 2))),
        )
    )
    return (
        credited.groupBy((F.col("c_id") % 3).cast("bigint").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(F.floor(F.col("value_micros") * F.col("permille") / 1000))
            .cast("bigint")
            .alias("credited_micros"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (round 6) — the mergeable frequency sketch
# ---------------------------------------------------------------------------

#: CMS geometry: 4 independent rows x 256 buckets (bucket = first hex
#: BYTE of md5(row ':' key) — the same md5-substring hash family the
#: minhash/SimHash operators use, DuckDB-computable with zero
#: hex-to-int conversion).
CMS_ROWS = 4
CMS_HH_DENOM = 300  # heavy hitter: estimate * 300 > total events


@register(
    "heavy_hitter_cms",
    oracle=f"""
    WITH cells AS (
        SELECT r, substr(md5(CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events CROSS JOIN range(0, {CMS_ROWS}) t(r)
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1
    ),
    est AS (
        SELECT e.user_id, e.n_events,
               MIN(cl.c) AS cms_estimate
        FROM exact e
        JOIN cells cl
          ON cl.bucket = substr(md5(CAST(cl.r AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)), 1, 2)
        GROUP BY 1, 2
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM events)
    SELECT user_id, n_events, CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(cms_estimate - n_events AS BIGINT) AS overcount
    FROM est, total
    WHERE cms_estimate * {CMS_HH_DENOM} > t
    """,
    doc=f"COUNT-MIN SKETCH heavy hitters: a {CMS_ROWS}x256 sketch (bucket "
    "= first md5 hex byte per row — the repo's engine-portable hash "
    "family) built with one map-side-combining aggregate, probed for "
    "every user by taking the MIN across rows; candidates whose "
    f"ESTIMATE exceeds total/{CMS_HH_DENOM} are reported with their "
    "exact count and the sketch's overcount — CMS never undercounts, so "
    "the candidate set provably contains every true heavy hitter (the "
    "audit the MG-sketch twin runs from the other direction).",
)
def heavy_hitter_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the sketch collapses map-side to 4x256 = 1,024 cells no
    matter the stream size (CMS is MERGEABLE: per-partition sketches
    add cell-wise — the same property that makes it streamable); the
    probe broadcasts those cells against user-grain rows. One
    events-grain shuffle total (the exact counts the audit compares
    against — a production use that trusts the sketch skips it)."""
    events = load_table(spark, sf_dir, "events")
    rows = F.array(*[F.lit(r) for r in range(CMS_ROWS)])
    cells = (
        events.select(F.explode(rows).alias("r"), "user_id")
        .select(
            "r",
            F.substring(
                F.md5(F.concat_ws(":", F.col("r").cast("string"), F.col("user_id").cast("string"))),
                1, 2,
            ).alias("bucket"),
        )
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    probes = exact.select(
        "user_id",
        "n_events",
        F.explode(rows).alias("r"),
    ).select(
        "user_id",
        "n_events",
        "r",
        F.substring(
            F.md5(F.concat_ws(":", F.col("r").cast("string"), F.col("user_id").cast("string"))),
            1, 2,
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("user_id", "n_events")
        .agg(F.min("c").alias("cms_estimate"))
    )
    total = events.agg(F.count(F.lit(1)).alias("t"))
    from etl_loading_scripts_spark.plancheck import broadcast_scalar

    return (
        est.crossJoin(broadcast_scalar(total))
        .filter(F.col("cms_estimate") * CMS_HH_DENOM > F.col("t"))
        .select(
            "user_id",
            "n_events",
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("n_events")).cast("long").alias("overcount"),
        )
    )
