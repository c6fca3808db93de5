"""Patron-segmentation analytics (patching_scripts/patron_segmentation.sql).

The reference's most complex analytical flow (PS:74-426): high-value diner
spend cube → multi-grain CTE cascade (TotalSpend → TerritorySpend →
RankedTerritories → ratios) → persona classification by threshold via a
3-branch UNION ALL (PS:184-209) → 'Undefined' backfill (PS:212-217) →
reporting aggregates (industry/client spend shares, top-10 minimarkets).

Re-expressed on the synthetic schema (FIXTURES §B): customer ≙ patron,
o_orderpriority ≙ sales territory, market segment ≙ industry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.operators import top1_per_group
from etl_loading_scripts_spark.registry import register

DEC = "decimal(18,4)"

_SEGMENTATION_ORACLE = """
WITH spend AS (                           -- PS:127-136 MinimarketSpend
    SELECT o_custkey, o_orderpriority,
           SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS terr_spend,
           CAST(COUNT(*) AS BIGINT) AS txn_count
    FROM orders GROUP BY 1, 2
),
total AS (                                -- PS:144-150 TotalSpend
    SELECT o_custkey, SUM(terr_spend) AS total_spend,
           CAST(COUNT(*) AS BIGINT) AS n_territories
    FROM spend GROUP BY 1
),
top_terr AS (                             -- PS:159-169 RankedTerritories rn=1
    SELECT o_custkey, o_orderpriority, terr_spend
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey
            ORDER BY terr_spend DESC, o_orderpriority
        ) AS rn FROM spend
    ) WHERE rn = 1
),
ratios AS (                               -- PS:171-182 MaxTerritorySpend ratio
    SELECT t.o_custkey,
           tt.o_orderpriority AS top_territory,
           CAST(tt.terr_spend AS DOUBLE) / CAST(t.total_spend AS DOUBLE) AS top_ratio,
           t.n_territories
    FROM total t JOIN top_terr tt ON t.o_custkey = tt.o_custkey
),
classified AS (                           -- PS:184-209 three disjoint branches
    SELECT o_custkey, 'Road Warrior' AS persona, top_ratio FROM ratios
    WHERE top_ratio >= 0.5
    UNION ALL
    SELECT o_custkey, 'City person', top_ratio FROM ratios
    WHERE top_ratio < 0.5 AND n_territories >= 4
    UNION ALL
    SELECT o_custkey, 'Office manager', top_ratio FROM ratios
    WHERE top_ratio < 0.5 AND n_territories < 4
)
SELECT c.c_custkey, COALESCE(cl.persona, 'Undefined') AS persona,
       COALESCE(cl.top_ratio, 0.0) AS top_ratio
FROM customer c LEFT JOIN classified cl ON c.c_custkey = cl.o_custkey
"""


@register(
    "persona_segmentation",
    oracle=_SEGMENTATION_ORACLE,
    doc="PS:74-217 end-to-end: spend cube → multi-grain ratio cascade → "
    "3-branch UNION ALL persona classification → Undefined backfill "
    "(O33/O39/O41/O48/O20). The engine's flagship query.",
)
def persona_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the cascade reuses one shuffle partitioning (o_custkey) across
    spend → total → top_terr → ratios, so Catalyst plans a single exchange;
    the final backfill is a left join of the customer dim against an
    aggregate that is ≤1 row per customer. The ~9M-row 'Undefined'
    backfill of the reference (PS:211) is the same left-join shape."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    spend = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("terr_spend"),
        F.count(F.lit(1)).alias("txn_count"),
    )
    # totals + top-territory in ONE pass: window aggregates over the same
    # o_custkey partitioning instead of a second groupBy + join-back (which
    # would re-scan and re-aggregate the orders subtree — Spark plans each
    # DataFrame consumer independently). One scan, two exchanges total.
    w_cust = Window.partitionBy("o_custkey")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("terr_spend").desc(), F.col("o_orderpriority")
    )
    ratios = (
        spend.select(
            "o_custkey",
            "o_orderpriority",
            "terr_spend",
            F.sum("terr_spend").over(w_cust).alias("total_spend"),
            F.count(F.lit(1)).over(w_cust).alias("n_territories"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("top_territory"),
            (
                F.col("terr_spend").cast("double") / F.col("total_spend").cast("double")
            ).alias("top_ratio"),
            "n_territories",
        )
    )
    # The reference classifies via a 3-branch UNION ALL (PS:184-209). The
    # branches are provably disjoint, so this engine plans the equivalent
    # single-pass when/otherwise chain: a literal union would re-evaluate
    # the whole cascade per branch (Spark does no cross-branch CSE —
    # observed 3x scans in explain()). SURVEY §2.7 documents the rewrite;
    # the UNION ALL operator itself is exercised by `union_all_segments`.
    classified = ratios.select(
        "o_custkey",
        F.when(F.col("top_ratio") >= 0.5, "Road Warrior")
        .when(F.col("n_territories") >= 4, "City person")
        .otherwise("Office manager")
        .alias("persona"),
        "top_ratio",
    )
    return customer.join(
        classified, customer.c_custkey == classified.o_custkey, "left"
    ).select(
        "c_custkey",
        F.coalesce(F.col("persona"), F.lit("Undefined")).alias("persona"),
        F.coalesce(F.col("top_ratio"), F.lit(0.0)).alias("top_ratio"),
    )


@register(
    "union_all_segments",
    oracle="""
    SELECT c_custkey, 'HIGH' AS balance_band, c_acctbal FROM customer WHERE c_acctbal >= 5000
    UNION ALL
    SELECT c_custkey, 'MID', c_acctbal FROM customer WHERE c_acctbal >= 0 AND c_acctbal < 5000
    UNION ALL
    SELECT c_custkey, 'NEGATIVE', c_acctbal FROM customer WHERE c_acctbal < 0
    """,
    doc="O48 PS:184-209: literal 3-branch UNION ALL over disjoint "
    "predicates (unionByName). Cheap per-branch scans of a dim table — "
    "the shape where a real union is the right plan.",
)
def union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    high = customer.filter(F.col("c_acctbal") >= 5000).select(
        "c_custkey", F.lit("HIGH").alias("balance_band"), "c_acctbal"
    )
    mid = customer.filter((F.col("c_acctbal") >= 0) & (F.col("c_acctbal") < 5000)).select(
        "c_custkey", F.lit("MID").alias("balance_band"), "c_acctbal"
    )
    neg = customer.filter(F.col("c_acctbal") < 0).select(
        "c_custkey", F.lit("NEGATIVE").alias("balance_band"), "c_acctbal"
    )
    return high.unionByName(mid).unionByName(neg)


@register(
    "industry_spend_share",
    oracle="""
    WITH seg_spend AS (                   -- PS:243-265 vw_IndustrySpend
        SELECT c.c_mktsegment AS industry,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS spend,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_diners
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    )
    SELECT industry,
           CAST(spend AS DOUBLE) AS industry_spend,
           n_diners,
           CAST(spend AS DOUBLE) / CAST((SELECT SUM(spend) FROM seg_spend) AS DOUBLE)
               AS pct_of_spend
    FROM seg_spend
    """,
    doc="PS:243-265 vw_IndustrySpend: spend + diner counts per industry "
    "with percent-of-total (O8 view as a saved query, O39 re-agg).",
)
def industry_spend_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    seg_spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("industry"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).alias("spend"),
            F.countDistinct("o_custkey").alias("n_diners"),
        )
    )
    w = Window.partitionBy()
    return seg_spend.select(
        "industry",
        F.col("spend").cast("double").alias("industry_spend"),
        "n_diners",
        (
            F.col("spend").cast("double") / F.sum("spend").over(w).cast("double")
        ).alias("pct_of_spend"),
    )


@register(
    "hvd_diner_counts",
    oracle="""
    SELECT c.c_mktsegment AS industry,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_diners,
           CAST(SUM(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_hvd,
           CAST(SUM(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END) AS DOUBLE) * 1.0
               / COUNT(*) AS pct_hvd
    FROM customer c
    GROUP BY 1
    """,
    doc="PS:413-426 DinersCount: high-value-diner counts and %HVD per "
    "industry (O36 conditional aggregation over a BIT-ish flag).",
)
def hvd_diner_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    hv = F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)
    return customer.groupBy(F.col("c_mktsegment").alias("industry")).agg(
        F.countDistinct("c_custkey").alias("n_diners"),
        F.sum(hv).alias("n_hvd"),
        (F.sum(hv).cast("double") * 1.0 / F.count(F.lit(1))).alias("pct_hvd"),
    )


@register(
    "client_topk_minimarkets",
    oracle="""
    WITH mm_spend AS (                    -- PS:357-400 ClientMinimarketSpend
        SELECT c.c_mktsegment AS industry, o.o_orderpriority AS minimarket,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS spend
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT industry, minimarket, CAST(spend AS DOUBLE) AS mm_spend, mm_rank
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY industry ORDER BY spend DESC, minimarket
        ) AS INT) AS mm_rank
        FROM mm_spend
    ) WHERE mm_rank <= 10
    """,
    doc="PS:357-400: top-10 minimarkets per client grain (O42 MMRank<=10).",
)
def client_topk_minimarkets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    mm_spend = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("industry"),
            F.col("o_orderpriority").alias("minimarket"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("spend"))
    )
    w = Window.partitionBy("industry").orderBy(F.col("spend").desc(), "minimarket")
    return (
        mm_spend.withColumn("mm_rank", F.row_number().over(w))
        .filter(F.col("mm_rank") <= 10)
        .select("industry", "minimarket", F.col("spend").cast("double").alias("mm_spend"), "mm_rank")
    )
