"""Declarative data-quality checks (the dbt-test / Deequ surface).

A check is (name, violations-DataFrame builder); ``run_checks`` evaluates
every check and returns the long-form report ``(check, n_violations)``.
Each violation count is an aggregate of a keyed join or a filtered scan —
nothing here materializes violating rows unless a check is drilled into
individually, so the report costs one pass per check at any scale (and
Catalyst shares scan subtrees where checks hit the same table).

Extends the publish-time referential-integrity assert
(``operators/publish.py``, reference O11) into a standing report.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

Check = tuple[str, Callable[[], DataFrame]]


def unique_check(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per key (0 ⇔ key is unique)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select((F.col("n") - 1).alias("extra"))
    )


def fk_check(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """Violations = child rows whose key has no parent (left anti join)."""
    return child.select(F.col(child_key).alias("k")).join(
        parent.select(F.col(parent_key).alias("k")).distinct(), "k", "left_anti"
    )


def run_checks(spark: SparkSession, checks: list[Check]) -> DataFrame:
    """Evaluate checks into the (check, n_violations) report.

    Counts are summed engine-side per check and unioned — the report is
    |checks| rows no matter the data size."""
    reports = []
    for name, builder in checks:
        df = builder()
        # unique_check emits weighted rows; everything else counts rows
        agg = (
            df.agg(F.coalesce(F.sum("extra"), F.lit(0)).cast("long").alias("n_violations"))
            if "extra" in df.columns
            else df.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        )
        reports.append(agg.select(F.lit(name).alias("check"), "n_violations"))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


@register(
    "data_quality_report",
    oracle="""
    SELECT 'orders_pk_unique' AS check,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events_ts_not_null',
           CAST(COUNT(*) FILTER (WHERE ts IS NULL) AS BIGINT)
    FROM events
    """,
    doc="Declarative data-quality report: PK uniqueness, two FK checks "
    "(left anti), a positivity rule, a range rule, and a not-null rule, "
    "as one (check, n_violations) table.",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    checks: list[Check] = [
        ("orders_pk_unique", lambda: unique_check(orders, ["o_orderkey"])),
        ("orders_fk_customer", lambda: fk_check(orders, "o_custkey", customer, "c_custkey")),
        ("lineitem_fk_orders", lambda: fk_check(lineitem, "l_orderkey", orders, "o_orderkey")),
        (
            "orders_totalprice_positive",
            lambda: orders.filter(F.col("o_totalprice") <= 0),
        ),
        (
            "lineitem_qty_range",
            lambda: lineitem.filter(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ),
        ),
        ("events_ts_not_null", lambda: events.filter(F.col("ts").isNull())),
    ]
    return run_checks(spark, checks)
