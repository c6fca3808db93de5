"""The full monthly load as a driver-visible query.

The oracle does NOT replicate the five stages — it derives the post-load
end state from first principles: a full-window run maps every patron and
billing group (the zero-unmapped invariant, tests/test_pipeline.py), fact
rows are 1:1 with orders, and restaurants stay unmapped exactly on the
seeded registry gap (site_id = o_orderkey % |supplier|, gap at % 4 == 0).
An independent derivation is a STRONGER check than mirrored CTEs — if any
stage regresses (over-maps, under-maps, drops or duplicates fact rows, or
corrupts amounts), the hash diverges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.constants import (
    UNMAPPED_BILLING_GROUP_KEY,
    UNMAPPED_PATRON_ID,
    UNMAPPED_RESTAURANT_KEY,
)
from etl_loading_scripts_spark.pipeline.domain import build_domain
from etl_loading_scripts_spark.pipeline.monthly_load import full_window, run_monthly_load
from etl_loading_scripts_spark.registry import register


@register(
    "monthly_load_e2e",
    oracle="""
    SELECT CAST(strftime(o.o_orderdate, '%Y%m') AS INT) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(COUNT(*) AS BIGINT) AS n_patron_mapped,
           CAST(SUM(CASE WHEN (o.o_orderkey % ns.n_sup) % 4 <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_restaurant_mapped,
           CAST(COUNT(*) AS BIGINT) AS n_billing_mapped,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS month_amount
    FROM orders o CROSS JOIN (SELECT COUNT(*) AS n_sup FROM supplier) ns
    GROUP BY 1
    """,
    doc="SURVEY §3.1 entry point A end-to-end: build the reference-domain "
    "warehouse from the star schema, run stages 1-5, return the post-load "
    "fact rolled up per month with mapped/unmapped counts — hash-checked "
    "against a first-principles derivation of the end state.",
)
def monthly_load_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    dom = build_domain(spark, sf_dir)
    out, _metrics = run_monthly_load(spark, dom, full_window(dom))
    fact = out.fact_transaction
    return (
        fact.groupBy((F.col("datekey") / 100).cast("int").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_txns"),
            F.sum(
                (F.col("patron_id") != UNMAPPED_PATRON_ID).cast("int")
            ).alias("n_patron_mapped"),
            F.sum(
                (F.col("restaurant_key") != UNMAPPED_RESTAURANT_KEY).cast("int")
            ).alias("n_restaurant_mapped"),
            F.sum(
                (F.col("billing_group_key") != UNMAPPED_BILLING_GROUP_KEY).cast("int")
            ).alias("n_billing_mapped"),
            F.sum(F.col("amount")).cast("double").alias("month_amount"),
        )
    )
