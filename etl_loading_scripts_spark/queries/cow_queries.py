"""Driver-visible queries for the copy-on-write partition mutations.

Each query materializes a month-partitioned order fact under ``/tmp``
(fresh per run — idempotent), applies a file-level-rewrite mutation
(``operators/cow.py``), and returns the full table's per-month end state,
which the DuckDB oracle derives independently from the ``orders`` view.
The byte-level "untouched partitions kept their files" half of the
contract is asserted in ``tests/test_cow.py`` (hash oracles can't see
file layout).

Reference shapes: MERGE ``P-SF:95-202`` (matched update / unmatched
insert / month-scoped NOT-MATCHED-BY-SOURCE delete), monthly ``DateKey
BETWEEN`` incremental window ``S4:91-107``, DELETE…WHERE ``P-RES:65-66``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.operators.cow import (
    delete_cow_partitioned,
    merge_cow_partitioned,
)
from etl_loading_scripts_spark.registry import register
from etl_loading_scripts_spark.sources.io import write_fact_partitioned

#: Inserted keys are offset far past any real TPC-H orderkey (sf1 tops out
#: around 6M; even sf100 stays under 1e9), so synthetic rows can't collide.
_INSERT_OFFSET = 1_000_000_000


def _order_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, datekey, price DECIMAL(18,4)) — the COW demos' fact shape.
    Decimal money keeps every aggregate bit-identical across engines."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("k"),
        (
            F.year("o_orderdate") * 10000
            + F.month("o_orderdate") * 100
            + F.dayofmonth("o_orderdate")
        ).cast("int").alias("datekey"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
    )


def _warehouse(tag: str, sf_dir: str) -> str:
    from etl_loading_scripts_spark.operators.deltalog import _fixture_dir

    return _fixture_dir(sf_dir, tag=tag)


def _month_rollup(df: DataFrame) -> DataFrame:
    return df.groupBy(F.col("month").cast("int").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("total_price"),
    )


@register(
    "merge_cow_month",
    oracle=f"""
    WITH mm AS (
        SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS m
        FROM orders GROUP BY 1 ORDER BY COUNT(*) DESC, m DESC LIMIT 1
    ),
    base AS (
        SELECT o_orderkey AS k,
               CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
               CAST(o_totalprice AS DECIMAL(18,4)) AS price
        FROM orders
    ),
    final AS (
        SELECT k, month, price FROM base, mm WHERE month <> mm.m
        UNION ALL
        SELECT k, month, CAST(price * 2 AS DECIMAL(18,4))
        FROM base, mm WHERE month = mm.m AND k % 2 = 0
        UNION ALL
        SELECT k + {_INSERT_OFFSET}, month, price
        FROM base, mm WHERE month = mm.m AND k % 97 = 0
    )
    SELECT month, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS total_price
    FROM final GROUP BY 1
    """,
    doc="File-level-rewrite MERGE (the lakehouse idiom on plain parquet): "
    "restate the busiest month of a month-partitioned order fact — even keys "
    "repriced ×2 (update), every 97th key re-inserted under a new key "
    "(insert), odd keys dropped (month-scoped NOT-MATCHED-BY-SOURCE "
    "delete) — then roll up the whole table per month. Months outside the "
    "window keep their files byte-identical (tests/test_cow.py).",
)
def merge_cow_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the merge lists, reads, and swaps ONLY the restated month's
    partition directory — at 100 TB a monthly restatement is a ~1/100th
    rewrite with a metadata-rename commit, while the join inside the
    window is an ordinary key shuffle (AQE broadcasts dimension-sized
    increments). This is `merge_upsert`'s semantics contract executed
    with Delta/Iceberg's physical behavior, minus their manifest layer
    (environment blocker recorded in BASELINE.md).

    The restated window is the BUSIEST month (tie-break: latest) — the
    calendar-tail month can be a 2-row stub whose keys are all odd,
    which would make the merge source empty and the demo vacuous."""
    base = _order_fact(spark, sf_dir)
    path = _warehouse("cow_merge", sf_dir)
    write_fact_partitioned(base, path)

    busiest = (
        base.groupBy((F.col("datekey") / 100).cast("int").alias("m"))
        .count()
        .orderBy(F.desc("count"), F.desc("m"))
        .first()["m"]
    )
    window = base.filter((F.col("datekey") / 100).cast("int") == busiest)
    updates = window.filter(F.col("k") % 2 == 0).withColumn(
        "price", (F.col("price") * 2).cast("decimal(18,4)")
    )
    inserts = window.filter(F.col("k") % 97 == 0).withColumn(
        "k", F.col("k") + F.lit(_INSERT_OFFSET)
    )
    merge_cow_partitioned(
        spark,
        path,
        updates.unionByName(inserts),
        on=["k"],
        delete_unmatched_source=True,
    )
    return _month_rollup(spark.read.parquet(path))


@register(
    "merge_cow_quarter",
    oracle=f"""
    WITH qq AS (
        SELECT CAST(strftime(o_orderdate, '%Y') AS INT) * 10
               + (CAST(strftime(o_orderdate, '%m') AS INT) + 2) // 3 AS yq
        FROM orders GROUP BY 1 ORDER BY COUNT(*) DESC, yq DESC LIMIT 1
    ),
    base AS (
        SELECT o_orderkey AS k,
               CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
               CAST(strftime(o_orderdate, '%Y') AS INT) * 10
               + (CAST(strftime(o_orderdate, '%m') AS INT) + 2) // 3 AS yq,
               CAST(o_totalprice AS DECIMAL(18,4)) AS price
        FROM orders
    ),
    final AS (
        SELECT k, month,
               CASE WHEN base.yq = qq.yq AND k % 3 = 0
                    THEN CAST(price * 3 AS DECIMAL(18,4)) ELSE price END AS price
        FROM base, qq
        UNION ALL
        SELECT k + {_INSERT_OFFSET}, month, price
        FROM base, qq WHERE base.yq = qq.yq AND k % 101 = 0
    )
    SELECT month, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS total_price
    FROM final GROUP BY 1
    """,
    doc="MULTI-MONTH file-level-rewrite MERGE: restate the busiest "
    "calendar QUARTER of the month-partitioned order fact in ONE merge "
    "— every 3rd key repriced ×3 (update), every 101st key re-inserted "
    "under a new key — then roll up the whole table per month. The one "
    "source spans three month partitions; each merges independently in "
    "the same (month, key) shuffle, and every month outside the quarter "
    "keeps its files byte-identical "
    "(tests/test_cow.py::test_merge_cow_quarter_rewrites_only_three_months).",
)
def merge_cow_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the quarterly restatement is the multi-month case the
    month-scoped merge was designed for — the effective key is
    (month, k), so a natural key recurring across the three affected
    months merges each month independently in one shuffle, one staged
    write, one per-partition two-phase commit sweep. At 100 TB a
    quarter is ~3/100ths of the fact rewritten; the other ~97 partitions
    are never listed, read, or renamed (byte-audited at test scale)."""
    base = _order_fact(spark, sf_dir)
    path = _warehouse("cow_quarter", sf_dir)
    write_fact_partitioned(base, path)

    yq = (
        (F.col("datekey") / 10000).cast("int") * 10
        + ((F.col("datekey") / 100).cast("int") % 100 + 2) / F.lit(3)
    ).cast("int")
    busiest_q = (
        base.groupBy(yq.alias("yq"))
        .count()
        .orderBy(F.desc("count"), F.desc("yq"))
        .first()["yq"]
    )
    window = base.filter(yq == busiest_q)
    updates = window.filter(F.col("k") % 3 == 0).withColumn(
        "price", (F.col("price") * 3).cast("decimal(18,4)")
    )
    inserts = window.filter(F.col("k") % 101 == 0).withColumn(
        "k", F.col("k") + F.lit(_INSERT_OFFSET)
    )
    stats = merge_cow_partitioned(
        spark, path, updates.unionByName(inserts), on=["k"]
    )
    assert len(stats["months_rewritten"]) == 3, stats
    return _month_rollup(spark.read.parquet(path))


@register(
    "delete_cow_purge",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 500 <> 7
    GROUP BY 1
    """,
    doc="GDPR-style purge with file-level rewrite: DELETE every order "
    "whose key falls in the forget set (k % 500 = 7) across ALL months "
    "of the partitioned fact, removing any partition directory the purge "
    "empties; remaining table rolled up per month.",
)
def delete_cow_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: a right-to-be-forgotten sweep must visit every partition,
    but each partition is rewritten independently (no global shuffle —
    the repartition key is the partition column itself) and committed by
    rename; parquet footer counts make the before/after row accounting
    metadata-only. Contrast `gdpr_forget_cascade` (the audit of WHAT to
    forget) — this is the physical erasure."""
    base = _order_fact(spark, sf_dir)
    path = _warehouse("cow_purge", sf_dir)
    write_fact_partitioned(base, path)
    delete_cow_partitioned(spark, path, F.col("k") % 500 == 7)
    return _month_rollup(spark.read.parquet(path))


@register(
    "compact_small_files",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1
    """,
    doc="Small-file compaction (lakehouse OPTIMIZE on plain parquet): a "
    "deliberately fragmented month-partitioned fact (8 writer tasks per "
    "month — the classic partitioned-write mistake) is bin-packed to "
    "~one target-size file per month via maxRecordsPerFile, committed "
    "with the COW two-phase rename sweep; the rollup proves compaction "
    "changed ZERO rows. File-count/byte assertions live in "
    "tests/test_compaction.py (a hash oracle can't see file layout).",
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the compactor's decision pass is metadata-only (listing +
    footer counts) and per-partition, so a nightly run reads only the
    partitions whose file count drifted past ceil(bytes/target); the
    rewrite bills exactly the fragmented partitions' bytes and commits
    crash-safe (operators/compaction.py). At 100 TB this is what keeps
    scan-side file-open cost O(data) instead of O(writes-ever-made)."""
    from etl_loading_scripts_spark.operators.compaction import (
        compact_partition_files,
    )

    base = _order_fact(spark, sf_dir)
    path = _warehouse("compact", sf_dir)
    write_fact_partitioned(base.repartition(8, "k"), path, compact=False)
    stats = compact_partition_files(spark, path)
    assert stats["months_compacted"], stats
    return _month_rollup(spark.read.parquet(path))


@register(
    "publish_set_atomic",
    oracle="""
    WITH dim AS (
        SELECT c_nationkey AS nation_key, COUNT(*) AS n_cust
        FROM customer GROUP BY 1
    ),
    fact AS (
        SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    ),
    dim2 AS (
        SELECT c_nationkey AS nation_key, COUNT(*) AS n_cust
        FROM customer WHERE c_custkey % 2 = 0 GROUP BY 1
    ),
    fact2 AS (
        SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS month,
               COUNT(*) AS n_orders
        FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
    )
    SELECT 'latest' AS snapshot, 'dim_customer_nation' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(nation_key * n_cust) AS BIGINT) AS checksum
    FROM dim2
    UNION ALL
    SELECT 'latest', 'fact_orders_month',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(month * n_orders) AS BIGINT) FROM fact2
    UNION ALL
    SELECT 'pinned_v1', 'dim_customer_nation',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(nation_key * n_cust) AS BIGINT) FROM dim
    UNION ALL
    SELECT 'pinned_v1', 'fact_orders_month',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(month * n_orders) AS BIGINT) FROM fact
    """,
    doc="Multi-table ATOMIC publish (the reference's P-SF transaction "
    "semantics, O10 closed): a dim + fact pair commits twice as "
    "versioned sets through one manifest + pointer flip, a third "
    "publish is crash-injected mid-set (one table written, no "
    "manifest), and the readback proves (a) the latest pointer serves "
    "the COMPLETE second set untorn by the debris, (b) version 1 stays "
    "pinned-readable for reproducible audits. Row counts and integer "
    "checksums of both snapshots against the DuckDB oracle.",
)
def publish_set_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: publish_set's own cost is one parquet write per table (no
    extra shuffle — the commit is a manifest write plus one pointer
    rename, O(1) driver metadata regardless of table size), so the
    transaction discipline is free at 100 TB. Readers pay nothing: one
    pointer read pins every table to the same version. POSIX scope
    documented on the operator; on object stores the same layout rides
    a table-format snapshot commit.
    """
    import shutil

    from pyspark.sql import Row

    from etl_loading_scripts_spark.operators.publish import (
        publish_set,
        read_published_set,
    )

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def tables(dim_src: DataFrame, fact_src: DataFrame) -> list:
        dim = dim_src.groupBy(
            F.col("c_nationkey").alias("nation_key")
        ).agg(F.count(F.lit(1)).alias("n_cust"))
        fact = fact_src.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("int")
            .alias("month")
        ).agg(F.count(F.lit(1)).alias("n_orders"))
        return [("dim_customer_nation", dim), ("fact_orders_month", fact)]

    base = _warehouse("pubset", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    v1 = publish_set(tables(customer, orders), base)
    v2 = publish_set(
        tables(
            customer.filter(F.col("c_custkey") % 2 == 0),
            orders.filter(F.col("o_orderkey") % 2 == 0),
        ),
        base,
    )
    assert (v1, v2) == (1, 2)
    # crash injection: a third publish dies after its first table, before
    # the manifest — readers must never see it
    tables(customer, orders)[0][1].write.parquet(f"{base}/v=3/dim_customer_nation")

    out = []
    for snapshot, version in (("latest", None), ("pinned_v1", 1)):
        for tbl, df in sorted(read_published_set(spark, base, version).items()):
            row = df.agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(
                    F.col(df.columns[0]).cast("long") * F.col(df.columns[1])
                ).cast("long").alias("cks"),
            ).collect()[0]
            out.append(Row(snapshot=snapshot, tbl=tbl, n_rows=row["n"], checksum=row["cks"]))
    return spark.createDataFrame(
        out, "snapshot string, tbl string, n_rows long, checksum long"
    )
