"""Z-order (Morton-curve) data layout and its pruning payoff, measured.

Multi-dimensional clustering: interleaving the bits of two join/filter
keys gives a 1-D sort key whose contiguous ranges are small rectangles in
(key1, key2) space — so *every* file in a Z-sorted table carries tight
min/max ranges on BOTH dimensions, and a predicate on either key can skip
most files (Delta OPTIMIZE ZORDER BY, Iceberg sort orders). Plain sorting
gets this for the leading key only.

The query computes the Z-value with pure integer bit arithmetic (identical
expression in Spark and DuckDB), buckets rows into 64 would-be files, and
reports each bucket's min/max on both keys plus whether a fixed mid-range
partkey predicate could prune it — i.e. the exact statistics a lakehouse
file-skipping index would persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

#: Bits per dimension (8+8 → 16-bit Z-values).
Z_BITS = 8

#: Z-values per bucket: 2^16 / 1024 = 64 buckets ("files").
Z_BUCKET = 1024


def _interleave_formula(px: str, sx: str) -> str:
    """Morton interleave as a plain integer expression — valid in both
    Spark SQL and DuckDB (same >>, &, * semantics on BIGINT)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({px} >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"(({sx} >> {i}) & 1) * {1 << (2 * i)}")
    return " + ".join(terms)


_Z_EXPR = _interleave_formula("px", "sx")


@register(
    "zorder_layout_stats",
    oracle=f"""
    WITH dom AS (
        SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs FROM lineitem
    ),
    scaled AS (
        SELECT l.l_partkey, l.l_suppkey,
               (l.l_partkey * {1 << Z_BITS}) // (d.maxp + 1) AS px,
               (l.l_suppkey * {1 << Z_BITS}) // (d.maxs + 1) AS sx,
               d.maxp
        FROM lineitem l CROSS JOIN dom d
    ),
    z AS (
        SELECT l_partkey, l_suppkey, maxp,
               ({_Z_EXPR}) // {Z_BUCKET} AS bucket
        FROM scaled
    )
    SELECT bucket,
           count(*) AS n_rows,
           min(l_partkey) AS min_p, max(l_partkey) AS max_p,
           min(l_suppkey) AS min_s, max(l_suppkey) AS max_s,
           CAST(max(l_partkey) < (min(maxp) // 4)
                OR min(l_partkey) > (min(maxp) // 4 + min(maxp) // 10)
                AS BOOLEAN) AS prunable_mid_partkey
    FROM z
    GROUP BY bucket
    """,
    doc="Z-order layout statistics: Morton-interleave scaled (partkey, "
    "suppkey) bits into a 16-bit Z-value, bucket into 64 would-be files, "
    "report per-file min/max on both keys and prunability under a fixed "
    "mid-range partkey predicate.",
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the domain max is a single-row broadcast; Z-value and bucket
    are codegen integer projections; the per-bucket rollup is one shuffle
    on 64 keys with map-side partials. Writing the actual layout is the
    same plan plus ``repartitionByRange(bucket)`` → parquet — the stats
    here are what the writer's footer would then serve to the scan
    planner. At 100 TB, bucket count scales with target file size, not
    row count."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    dom = li.agg(
        F.max("l_partkey").alias("maxp"), F.max("l_suppkey").alias("maxs")
    )
    scaled = li.crossJoin(F.broadcast(dom)).select(
        "l_partkey",
        "l_suppkey",
        "maxp",
        F.expr(f"(l_partkey * {1 << Z_BITS}) div (maxp + 1)").alias("px"),
        F.expr(f"(l_suppkey * {1 << Z_BITS}) div (maxs + 1)").alias("sx"),
    )
    z = scaled.select(
        "l_partkey",
        "l_suppkey",
        "maxp",
        F.expr(f"({_Z_EXPR}) div {Z_BUCKET}").alias("bucket"),
    )
    lo = F.expr("min(maxp) div 4")
    hi = F.expr("min(maxp) div 4 + min(maxp) div 10")
    return z.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("min_p"),
        F.max("l_partkey").alias("max_p"),
        F.min("l_suppkey").alias("min_s"),
        F.max("l_suppkey").alias("max_s"),
        ((F.max("l_partkey") < lo) | (F.min("l_partkey") > hi))
        .cast("boolean")
        .alias("prunable_mid_partkey"),
    )
