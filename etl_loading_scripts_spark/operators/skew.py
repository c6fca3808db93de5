"""Skew mitigation: salted joins (SURVEY §4 — 'merchant-name hot keys').

AQE's skew-join handles most runtime skew (enabled in the session factory);
explicit salting remains the tool when one key dominates so heavily that
even split partitions overwhelm a task — the reference's ``'MC'`` client
rows (S1:97) are exactly that shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: spread each key over
    ``n_salt`` sub-partitions, replicate the other side n_salt ways, join on
    (key, salt).

    The salt is derived from ``xxhash64`` of the full row (deterministic for
    a given row, uniform across duplicates of the hot key) — never
    ``rand()``, which breaks retry determinism. Result equality with the
    plain join is unit-tested.

    Cost model: replicates ``small`` n_salt× — use when |small| ≪ the hot
    partition, which is precisely the skew scenario. For skewed-BOTH-sides
    joins, salt only the hot key list (two-pass: split hot keys out, plain
    join the rest).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salt))
    left = skewed.withColumn("__salt__", salt)
    right = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt__", F.col("__salt__").cast("long"))
    out = left.join(right, [key, "__salt__"], how)
    return out.drop("__salt__")


#: Deterministic dirty-data rule for the demonstration: keys ≡ 0 (mod 101)
#: arrive as NULL (unparseable upstream ids).
NULLIFY_MOD = 101


@register(
    "null_skew_isolated_join",
    oracle=f"""
    WITH dirty AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_custkey % {NULLIFY_MOD} = 0 THEN NULL
                    ELSE o_custkey END AS cust_k
        FROM orders
    )
    SELECT COALESCE(c.c_mktsegment, 'UNMATCHED') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(d.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
    FROM dirty d LEFT JOIN customer c ON c.c_custkey = d.cust_k
    GROUP BY 1
    """,
    doc="NULL-skew isolated join: orders whose customer key arrived NULL "
    "(keys ≡ 0 mod 101 stand in for unparseable ids) NEVER enter the "
    "join — they bypass it map-side and union back as UNMATCHED — while "
    "non-null rows take the normal equi-join; per-segment rollup.",
)
def null_skew_isolated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE classic silent shuffle-killer: in a plain left join every
    NULL key hashes to the same shuffle partition — one straggler task
    holds ALL the dirty rows (at 100 TB, often 1-10% of a fact = one
    task processing terabytes) even though NULL can never match. The
    isolation rewrite splits before the exchange: NULL rows take a
    map-only path (they need no lookup by definition), only non-null
    rows shuffle. Same result set as the naive join — asserted by the
    oracle, which states the naive LEFT JOIN — with the skew partition
    deleted from the plan. The same split applies to any
    high-frequency junk key (empty string, 0, 'UNKNOWN'): isolate,
    bypass, union."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    dirty = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_custkey") % NULLIFY_MOD == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("cust_k"),
    )
    nonnull = dirty.filter(F.col("cust_k").isNotNull()).join(
        cust.select(F.col("c_custkey").alias("cust_k"), "c_mktsegment"),
        "cust_k",
        "left",
    )
    nulls = dirty.filter(F.col("cust_k").isNull()).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    return (
        nonnull.select("o_totalprice", "c_mktsegment")
        .unionAll(nulls.select("o_totalprice", "c_mktsegment"))
        .groupBy(F.coalesce("c_mktsegment", F.lit("UNMATCHED")).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("spend"),
        )
    )
