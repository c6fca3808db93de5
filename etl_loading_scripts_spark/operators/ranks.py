"""Global ranking without a single-task sort (SURVEY §4.4 scale notes).

``ROW_NUMBER() OVER (ORDER BY …)`` and ``NTILE(n) OVER (ORDER BY …)`` both
plan as an ``Exchange SinglePartition`` + one-task sort — the classic
100 TB killer (VERDICT r1 items 3 and 6). The primitives here produce the
IDENTICAL assignments through range buckets:

1. range-repartition on the sort key — range partition *i* holds keys
   strictly below partition *i+1*'s;
2. one pass collects per-partition ``(count, min key)``; the driver folds
   them into boundary literals with cumulative offsets (bytes, not data);
3. the ranking pass assigns each row a bucket by *comparing its key to the
   boundary literals* — a pure expression, immune to AQE re-planning the
   exchange between the two passes — then global rank = partition-local
   ``row_number`` + the bucket's offset.

Contract: the sort key must be unique per row (ties would make any
ROW_NUMBER assignment arbitrary — same caveat as the window idiom).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _rank_via_range_buckets(
    df: DataFrame,
    order_by: Sequence[str],
    rank_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """(df + 1-based global rank over ascending ``order_by``, total rows)."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    order_cols = [F.col(c) for c in order_by]
    key_struct = F.struct(*[F.col(c).alias(f"f{i}") for i, c in enumerate(order_by)])

    stats = (
        df.repartitionByRange(n, *order_cols)
        .select(F.spark_partition_id().alias("__pid__"), key_struct.alias("__k__"))
        .groupBy("__pid__")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("__k__").alias("lo"))
        .collect()
    )
    stats.sort(key=lambda r: r["__pid__"])
    offsets, total = [], 0
    for r in stats:
        offsets.append((r["lo"], total))
        total += r["cnt"]

    def lit_struct(v):
        return F.struct(*[F.lit(x).alias(f"f{i}") for i, x in enumerate(v)])

    # bucket = number of boundaries at or below the key. ~32 buckets → a
    # comparison chain; at 10⁴+ buckets swap for a broadcast range join.
    bucket = F.lit(0)
    for lo, _ in offsets[1:]:
        bucket = bucket + (key_struct >= lit_struct(lo)).cast("int")
    off_df = spark.createDataFrame(
        [(i, off) for i, (_, off) in enumerate(offsets)] or [(0, 0)],
        "__bucket__ int, __off__ long",
    )

    w = Window.partitionBy("__bucket__").orderBy(*order_cols)
    ranked = (
        df.withColumn("__bucket__", bucket)
        .join(F.broadcast(off_df), "__bucket__")
        .withColumn(
            rank_col, (F.col("__off__") + F.row_number().over(w)).cast("long")
        )
        .select(*df.columns, rank_col)
    )
    return ranked, total


def global_row_number(
    df: DataFrame,
    order_by: Sequence[str],
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ROW_NUMBER() OVER (ORDER BY order_by ASC)`` with no global sort."""
    ranked, _ = _rank_via_range_buckets(df, order_by, rank_col, num_partitions)
    return ranked


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: Sequence[str],
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order_by ASC)`` — EXACT SQL semantics
    (first ``total mod n`` tiles take the extra row), derived
    arithmetically from the scalable global rank, so the plan has no
    single-partition window. For descending keys pass a negated/derived
    ascending column."""
    ranked, total = _rank_via_range_buckets(df, order_by, "__rank__", num_partitions)
    q, r = divmod(total, n_buckets)
    rank = F.col("__rank__")
    if q == 0:
        tile = rank  # fewer rows than buckets: row i -> tile i
    else:
        big = q + 1  # tiles 1..r have q+1 rows, tiles r+1..n have q
        head = r * big
        tile = F.when(rank <= head, (rank - 1) / big + 1).otherwise(
            r + (rank - head - 1) / q + 1
        )
    return ranked.withColumn(tile_col, F.floor(tile).cast("int")).drop("__rank__")


def global_cumsum(
    df: DataFrame,
    order_by: Sequence[str],
    value_col: str,
    cum_col: str = "cum",
    rank_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY order_by ROWS UNBOUNDED PRECEDING)``
    — the global running total — with no single-partition sort.

    Same two-pass range-bucket scheme as the global rank: the stats pass
    additionally folds per-partition *value sums* into cumulative sum
    offsets, so each row's running total is its bucket's sum offset plus
    a bucket-local cumulative window. Optionally also emits the global
    row number (``rank_col``) from the same pass for free. The sort key
    must be unique per row (same contract as ``global_row_number``).
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    order_cols = [F.col(c) for c in order_by]
    key_struct = F.struct(*[F.col(c).alias(f"f{i}") for i, c in enumerate(order_by)])

    stats = (
        df.repartitionByRange(n, *order_cols)
        .select(
            F.spark_partition_id().alias("__pid__"),
            key_struct.alias("__k__"),
            F.col(value_col).alias("__v__"),
        )
        .groupBy("__pid__")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("__k__").alias("lo"),
            F.sum("__v__").alias("vsum"),
        )
        .collect()
    )
    stats.sort(key=lambda r: r["__pid__"])
    offsets, total_rows, total_val = [], 0, 0
    for r in stats:
        offsets.append((r["lo"], total_rows, total_val))
        total_rows += r["cnt"]
        total_val += r["vsum"]

    def lit_struct(v):
        return F.struct(*[F.lit(x).alias(f"f{i}") for i, x in enumerate(v)])

    bucket = F.lit(0)
    for lo, _, _ in offsets[1:]:
        bucket = bucket + (key_struct >= lit_struct(lo)).cast("int")
    off_df = spark.createDataFrame(
        [(i, roff, voff) for i, (_, roff, voff) in enumerate(offsets)]
        or [(0, 0, 0)],
        "__bucket__ int, __roff__ long, __voff__ long",
    )

    w = (
        Window.partitionBy("__bucket__")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("__bucket__").orderBy(*order_cols)
    out = (
        df.withColumn("__bucket__", bucket)
        .join(F.broadcast(off_df), "__bucket__")
        .withColumn(
            cum_col,
            (F.col("__voff__") + F.sum(value_col).over(w)).cast("long"),
        )
    )
    cols = [*df.columns, cum_col]
    if rank_col is not None:
        out = out.withColumn(
            rank_col, (F.col("__roff__") + F.row_number().over(wr)).cast("long")
        )
        cols.append(rank_col)
    return out.select(*cols)
