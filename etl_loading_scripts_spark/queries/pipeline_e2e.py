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
from etl_loading_scripts_spark.pipeline.monthly_load import (
    full_window,
    run_monthly_load,
    run_monthly_load_partitioned,
)
from etl_loading_scripts_spark.registry import register


def _fact_month_rollup(fact: DataFrame) -> DataFrame:
    """Per-month mapped/unmapped counts + amount — the shared end-state
    shape both e2e variants hash-check."""
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
    return _fact_month_rollup(out.fact_transaction)


@register(
    "monthly_load_partitioned_e2e",
    oracle="""
    WITH ns AS (SELECT COUNT(*) AS n_sup FROM supplier),
    mm AS (
        SELECT CAST(strftime(MIN(o_orderdate), '%Y%m') AS INT) AS m FROM orders
    )
    SELECT CAST(strftime(o.o_orderdate, '%Y%m') AS INT) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(SUM(CASE WHEN CAST(strftime(o.o_orderdate, '%Y%m') AS INT) = mm.m
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_patron_mapped,
           CAST(SUM(CASE WHEN CAST(strftime(o.o_orderdate, '%Y%m') AS INT) = mm.m
                          AND (o.o_orderkey % ns.n_sup) % 4 <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_restaurant_mapped,
           CAST(SUM(CASE WHEN CAST(strftime(o.o_orderdate, '%Y%m') AS INT) = mm.m
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_billing_mapped,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS month_amount
    FROM orders o CROSS JOIN ns CROSS JOIN mm
    GROUP BY 1
    """,
    doc="The monthly load run INCREMENTALLY against the month-partitioned "
    "fact layout (SURVEY §4's single most important physical design "
    "choice): fact staged hive-partitioned by month, ONE month window "
    "loaded (partition-pruned scan, plan-asserted in tests), published "
    "back via dynamic partition overwrite, full table rolled up. Oracle: "
    "the loaded month reaches full patron/billing mapping with the "
    "seeded restaurant-registry gap; every other month's partition is "
    "byte-untouched at its seeded unmapped state.",
)
def monthly_load_partitioned_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each run writes only the window's partition (dynamic
    overwrite) and its update waves scan only that partition's files —
    the 'rerun last month' remediation (BASELINE scale facts) as a
    bounded write. The full-layout staging write here is test-harness
    setup; a deployed warehouse is already stored in this layout."""
    import hashlib
    import os
    import tempfile

    dom = build_domain(spark, sf_dir)
    lo_dk = dom.fact_transaction.agg(F.min("datekey")).first()[0]
    month = lo_dk // 100
    window = (month * 100 + 1, month * 100 + 31)
    warehouse = os.path.join(
        tempfile.gettempdir(),
        f"fact_wh_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    out, _metrics = run_monthly_load_partitioned(spark, dom, window, warehouse)
    return _fact_month_rollup(out.fact_transaction)
