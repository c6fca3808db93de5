"""The full monthly load as a driver-visible query (rows-only check).

The five-stage pipeline allocates surrogate keys across stages and rewrites
the fact three times — expressing that as one DuckDB SQL statement would be
a page of nested CTEs duplicating the engine under test, so this entry uses
the driver's weaker rows-only check; the per-stage invariants are enforced
in tests/test_pipeline.py instead (and each constituent operator has its own
oracle-checked query).
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
from etl_loading_scripts_spark.queries.base import register


@register(
    "monthly_load_e2e",
    oracle=None,
    doc="SURVEY §3.1 entry point A end-to-end: build the reference-domain "
    "warehouse from the star schema, run stages 1-5, return the post-load "
    "fact rolled up per month with mapped/unmapped counts.",
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
