"""SURVEY §2 operator inventory as named queries — joins, mutations, scans.

Each query re-expresses one reference operator shape on the driver's
synthetic star schema (role mapping per FIXTURES.md §B) and pairs it with a
DuckDB oracle. Citations name the reference statement the operator comes
from (aliases per SURVEY.md §"File aliases").

Scale notes are attached per query: what shuffles, what broadcasts, and why
the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.functions import tsql
from etl_loading_scripts_spark.operators import (
    insert_if_absent,
    merge_upsert,
    or_join,
    anti_not_in,
    update_from_join,
)
from etl_loading_scripts_spark.registry import register

DEC = "decimal(18,4)"

# ---------------------------------------------------------------------------
# O25/O12/M1 — the signature operation: computed-expression fingerprint join
# (PreparePOStoTxnMap_script.sql S1:7-25)
# ---------------------------------------------------------------------------

def _fp_norm_sql(expr: str) -> str:
    """DuckDB twin of :func:`tsql.norm_name` — UPPER(TRIM(x)) with NULL→''."""
    return f"upper(coalesce(trim({expr}), ''))"


#: The 8 'merchant identity' fields of the supplier stand-in, mirroring the
#: reference's 8-way CONCAT (S1:7-14: number, legal name, REPLACE-cleaned
#: display name, address line, city, state, zero-padded postal, country) on
#: the synthetic schema (FIXTURES §B): supplier enriched with its nation and
#: region names plays the merchant; derived address/postal fields exercise
#: the computed-field-inside-the-hash shape.
_FP_FIELDS = [
    ("cast(s_suppkey as varchar)", lambda: F.col("s_suppkey").cast("string")),
    ("s_name", lambda: F.col("s_name")),
    # the reference strips a 'REV:' prefix with REPLACE before normalizing
    ("replace(s_name, 'Supplier#', '')",
     lambda: F.replace(F.col("s_name"), F.lit("Supplier#"), F.lit(""))),
    ("concat_ws(' ', cast(s_suppkey % 999 as varchar), n_name)",
     lambda: F.concat_ws(" ", (F.col("s_suppkey") % 999).cast("string"), F.col("n_name"))),
    ("n_name", lambda: F.col("n_name")),
    ("cast(s_nationkey as varchar)", lambda: F.col("s_nationkey").cast("string")),
    ("lpad(cast(s_suppkey % 100 as varchar), 5, '0')",
     lambda: F.lpad((F.col("s_suppkey") % 100).cast("string"), 5, "0")),
    ("r_name", lambda: F.col("r_name")),
]

_FP_FIELDS_SQL = " || '|' || ".join(_fp_norm_sql(sql) for sql, _ in _FP_FIELDS)

_MERCHANT_SQL = f"""
        SELECT s_suppkey, s_name, s_nationkey, n_name, r_name,
               md5({_FP_FIELDS_SQL}) AS simhash,
               upper(coalesce(trim(s_name), '')) AS merchant_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
"""

def _fp_col():
    return tsql.simhash_fingerprint([make() for _, make in _FP_FIELDS])


def _merchant_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier enriched with nation/region names + its 8-field fingerprint.

    Both lookups are tiny dims → broadcast; the enrichment never shuffles
    the supplier side. The fingerprint is materialized HERE, dimension-side
    (one md5 per merchant), so fact-side probes join the broadcast dim and
    read the hash instead of re-evaluating the 8-way normalized concat per
    fact row — at 100 TB that's the difference between 10⁶ and 10¹² hash
    evaluations for identical results (the hash depends only on merchant
    attributes). Measured 3× on the sf0.1 bench."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_nationkey", "n_name", "r_name")
        .withColumn("simhash", _fp_col())
        .withColumn("merchant_name", tsql.norm_name("s_name"))
    )


@register(
    "fingerprint_probe_map",
    oracle=f"""
    WITH merchant AS ({_MERCHANT_SQL}),
    registry AS (
        SELECT DISTINCT simhash, s_suppkey FROM merchant
    ),
    probe AS (
        SELECT l.l_orderkey, l.l_extendedprice, l.l_discount, s.simhash
        FROM lineitem l JOIN merchant s ON l.l_suppkey = s.s_suppkey
    )
    SELECT p.simhash,
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(SUM(CAST(p.l_extendedprice * (1 - p.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(r.s_suppkey) AS BIGINT) AS n_mapped
    FROM probe p LEFT JOIN registry r ON p.simhash = r.simhash
    GROUP BY p.simhash
    """,
    doc="S1:5-26 stage-1 map: probe transactions against the fingerprint "
    "registry on a computed md5 identity key, count mapped/unmapped.",
)
def fingerprint_probe_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's POS→Txn fingerprint probe (S1:18-25): fuzzy 8-field
    merchant identity collapsed into ONE equi-join key so the join shuffles
    hash-partitioned instead of nested-looping. The hash input is the full
    8-way normalized concat (S1:7-14), incl. a REPLACE-cleaned name and a
    zero-padded derived field, matching the reference's shape.

    Scale: the fingerprint is computed once per merchant in the broadcast
    dim (:func:`_merchant_dim`); the fact side joins the broadcast and
    reads the hash. At 100 TB the only shuffle is the final groupBy on the
    hash (high cardinality, no skew)."""
    dim = _merchant_dim(spark, sf_dir).select("s_suppkey", "simhash")
    lineitem = load_table(spark, sf_dir, "lineitem")
    registry = dim.select("simhash", "s_suppkey").distinct()
    probe = (
        lineitem.join(F.broadcast(dim), lineitem.l_suppkey == dim.s_suppkey)
        .select("l_orderkey", "l_extendedprice", "l_discount", "simhash")
    )
    return (
        probe.join(F.broadcast(registry), "simhash", "left")
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_txns"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count("s_suppkey").alias("n_mapped"),
        )
    )


@register(
    "new_fingerprint_insert",
    oracle=f"""
    WITH merchant AS ({_MERCHANT_SQL}),
    existing AS (
        SELECT DISTINCT simhash FROM merchant WHERE s_suppkey % 4 <> 0
    ),
    candidates AS (
        SELECT s.simhash, s.merchant_name,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS client_count,
               CAST(COUNT(*) AS BIGINT) AS txn_count,
               MAX(CAST(strftime(l.l_shipdate, '%Y%m%d') AS INT)) AS last_seen_datekey
        FROM lineitem l
        JOIN merchant s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    )
    SELECT c.* FROM candidates c
    LEFT JOIN existing e ON c.simhash = e.simhash
    WHERE e.simhash IS NULL
    """,
    doc="S1:46-128: insert NEW fingerprints — group txns by normalized "
    "merchant identity + hash, ClientCount=COUNT(DISTINCT client), "
    "anti-join on existing SimHash (O20/O34/O35).",
)
def new_fingerprint_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY on computed expressions incl. the hash itself (O35,
    S1:103-128) + left-anti insert guard (S1:84-92).

    Scale: one shuffle for the groupBy on the hash key; the anti-join
    broadcasts the existing-hash set (registry ≪ fact). countDistinct adds a
    partial/final two-phase agg — no driver involvement. The hash comes
    precomputed from the broadcast merchant dim (one md5 per merchant,
    not per fact row)."""
    dim = _merchant_dim(spark, sf_dir).select("s_suppkey", "simhash", "merchant_name")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    existing = (
        dim.filter(F.col("s_suppkey") % 4 != 0)
        .select("simhash")
        .distinct()
    )
    candidates = (
        lineitem.join(F.broadcast(dim), lineitem.l_suppkey == dim.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("simhash", "merchant_name")
        .agg(
            F.countDistinct("o_custkey").alias("client_count"),
            F.count(F.lit(1)).alias("txn_count"),
            F.max(tsql.datekey("l_shipdate")).alias("last_seen_datekey"),
        )
    )
    return candidates.join(F.broadcast(existing), "simhash", "left_anti")


# ---------------------------------------------------------------------------
# O20 — insert-if-absent (anti-join guarded append), the dominant idiom
# (script.sql S2:23-28,57-63; UpdtMapDimPatron P-PAT:48-62)
# ---------------------------------------------------------------------------


@register(
    "insert_if_absent_dim",
    oracle="""
    SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT c_custkey, c_name FROM customer c
    WHERE c_custkey % 3 <> 0
      AND NOT EXISTS (
        SELECT 1 FROM customer e WHERE e.c_custkey % 3 = 0 AND e.c_custkey = c.c_custkey
      )
    """,
    doc="O20 S2:23-28: LEFT JOIN target / IS NULL / INSERT == left-anti "
    "guarded append; idempotent by construction.",
)
def insert_if_absent_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dogfoods the engine's ``insert_if_absent`` primitive against an
    independent SQL formulation (UNION ALL + NOT EXISTS)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dim = customer.filter(F.col("c_custkey") % 3 == 0)
    return insert_if_absent(dim, customer, on=["c_custkey"])


# ---------------------------------------------------------------------------
# O5/O19 — UPDATE…FROM join with sentinel guards
# (S2:31-37; S3:26-29; UpdMapDimRest P-RES:466-473)
# ---------------------------------------------------------------------------


@register(
    "update_fact_sentinel",
    oracle="""
    WITH fact AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 0 ELSE o_custkey END AS cust_fk,
               o_custkey
        FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN cust_fk = 0 THEN o_custkey ELSE cust_fk END AS cust_fk
    FROM fact
    """,
    doc="O5+O19: fact rows with sentinel FK=0 are remapped from the mapping "
    "table; mapped rows are never overwritten (S4:102-107).",
)
def update_fact_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dogfoods ``update_from_join``: the oracle states the expected result
    as a direct CASE expression; the Spark side actually runs the engine's
    rewrite-table primitive (left join + guarded coalesce).

    Scale: the mapping join shuffles on the fact's natural key; with the
    fact parquet partitioned by month and the reference's ``DateKey
    BETWEEN`` guard, only ~1 month partition is read and rewritten."""
    orders = load_table(spark, sf_dir, "orders")
    fact = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(0))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
    )
    mapping = orders.select("o_orderkey", F.col("o_custkey").alias("true_cust"))
    out = update_from_join(
        fact,
        mapping,
        on=["o_orderkey"],
        set_cols={"cust_fk": "true_cust"},
        guard=F.col("cust_fk") == 0,
    )
    return out.select("o_orderkey", F.col("cust_fk").cast("long").alias("cust_fk"))


# ---------------------------------------------------------------------------
# O4 — MERGE with full delete-sync + protected rows
# (BillingGroup S4:15-46; spScript P-SF:95-202, guard at 201-202)
# ---------------------------------------------------------------------------


@register(
    "merge_full_sync",
    oracle="""
    WITH target AS (
        SELECT s_suppkey, 0.0 AS s_acctbal FROM supplier
        WHERE s_suppkey % 3 <> 0 OR s_suppkey = 0
    ),
    source AS (
        SELECT s_suppkey, s_acctbal FROM supplier WHERE s_suppkey % 2 = 0
    )
    SELECT COALESCE(t.s_suppkey, s.s_suppkey) AS s_suppkey,
           CASE WHEN s.s_suppkey IS NOT NULL THEN s.s_acctbal ELSE t.s_acctbal END AS s_acctbal
    FROM target t FULL OUTER JOIN source s ON t.s_suppkey = s.s_suppkey
    WHERE s.s_suppkey IS NOT NULL        -- matched or inserted survive
       OR t.s_suppkey = 0                -- protected row survives the sync
    """,
    doc="O4 P-SF:95-202: MERGE matched→update, new→insert, NOT MATCHED BY "
    "SOURCE→delete except delete_guard-protected rows (P-SF:201-202).",
)
def merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dogfoods ``merge_upsert`` full-sync against an independent full-outer
    SQL formulation. Scale: single shuffle on the merge key; source
    broadcast when dimension-sized."""
    supplier = load_table(spark, sf_dir, "supplier")
    target = (
        supplier.filter((F.col("s_suppkey") % 3 != 0) | (F.col("s_suppkey") == 0))
        .select("s_suppkey", F.lit(0.0).alias("s_acctbal"))
    )
    source = supplier.filter(F.col("s_suppkey") % 2 == 0).select("s_suppkey", "s_acctbal")
    return merge_upsert(
        target,
        source,
        on=["s_suppkey"],
        update_cols=["s_acctbal"],
        delete_unmatched_source=True,
        delete_guard=F.col("s_suppkey") == 0,
    )


@register(
    "merge_schema_evolution",
    oracle="""
    WITH target AS (
        SELECT s_suppkey, CAST(s_acctbal AS DECIMAL(18,4)) AS s_acctbal
        FROM supplier
    ),
    source AS (
        SELECT s_suppkey,
               CAST(s_acctbal AS DECIMAL(18,4)) * 2 AS s_acctbal,
               CASE WHEN s_suppkey % 2 = 0 THEN 'api' ELSE 'batch' END AS channel
        FROM supplier WHERE s_suppkey % 5 = 0
        UNION ALL
        SELECT s_suppkey + 1000000, CAST(1.0 AS DECIMAL(18,4)), 'new'
        FROM supplier WHERE s_suppkey % 50 = 0
    )
    SELECT COALESCE(t.s_suppkey, s.s_suppkey) AS s_suppkey,
           CAST(CASE WHEN s.s_suppkey IS NOT NULL
                     THEN s.s_acctbal ELSE t.s_acctbal END AS DOUBLE) AS s_acctbal,
           CASE WHEN s.s_suppkey IS NOT NULL THEN s.channel END AS channel
    FROM target t FULL OUTER JOIN source s ON t.s_suppkey = s.s_suppkey
    """,
    doc="MERGE with automatic schema evolution (Delta autoMerge idiom): "
    "the source carries a NEW column (channel) the target lacks; the "
    "merge widens the target — matched rows take the source's channel "
    "and doubled balance, inserted rows arrive complete, untouched rows "
    "carry NULL in the new column. The schema-governance default stays "
    "strict (evolve_schema=False drops unknown source columns).",
)
def merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: evolution costs nothing beyond the merge itself — the new
    column enters the plan as a NULL literal on the target side of the
    same single key shuffle; no table rewrite happens until the result
    is persisted (and then only the affected partitions under the COW
    writer). This is the schema-drift half of real ingestion: upstream
    teams add fields mid-quarter and the nightly merge must not drop
    them on the floor — nor silently widen without an explicit opt-in."""
    supplier = load_table(spark, sf_dir, "supplier")
    target = supplier.select(
        "s_suppkey", F.col("s_acctbal").cast("decimal(18,4)").alias("s_acctbal")
    )
    source = supplier.filter(F.col("s_suppkey") % 5 == 0).select(
        "s_suppkey",
        (F.col("s_acctbal").cast("decimal(18,4)") * 2).alias("s_acctbal"),
        F.when(F.col("s_suppkey") % 2 == 0, "api").otherwise("batch").alias("channel"),
    ).unionByName(
        supplier.filter(F.col("s_suppkey") % 50 == 0).select(
            (F.col("s_suppkey") + 1000000).alias("s_suppkey"),
            F.lit(1.0).cast("decimal(18,4)").alias("s_acctbal"),
            F.lit("new").alias("channel"),
        )
    )
    merged = merge_upsert(target, source, on=["s_suppkey"], evolve_schema=True)
    return merged.select(
        "s_suppkey", F.col("s_acctbal").cast("double").alias("s_acctbal"), "channel"
    )


# ---------------------------------------------------------------------------
# O21/O22 — NOT IN / IN subqueries as anti/semi joins (P-PAT:40; P-RES:25)
# ---------------------------------------------------------------------------


@register(
    "anti_customers_without_orders",
    oracle="""
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    GROUP BY n.n_name
    """,
    doc="O21 P-PAT:40: NOT IN subquery → left-anti join (NULL subquery "
    "values dropped first, SURVEY R5).",
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    no_orders = anti_not_in(customer, orders.select("o_custkey"), "c_custkey", "o_custkey")
    return (
        no_orders.join(F.broadcast(nation), no_orders.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "semi_suppliers_with_sales",
    oracle="""
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM lineitem)
    GROUP BY n.n_name
    """,
    doc="O22 P-RES:25: IN subquery → left-semi join.",
)
def semi_suppliers_with_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    active = supplier.join(
        lineitem.select(F.col("l_suppkey").alias("s_suppkey")), "s_suppkey", "left_semi"
    )
    return (
        active.join(F.broadcast(nation), active.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )


# ---------------------------------------------------------------------------
# O26 — composite-key join (S2:61,70: proxy = concat(client,'_',emp,'_',cc))
# ---------------------------------------------------------------------------


@register(
    "composite_key_join",
    oracle="""
    WITH dim AS (
        SELECT CAST(c_nationkey AS VARCHAR) || '_' ||
               right('0000' || CAST(c_custkey AS VARCHAR), 4) AS proxy_id,
               c_custkey, c_nationkey
        FROM customer
    ),
    staging AS (
        SELECT DISTINCT CAST(c.c_nationkey AS VARCHAR) || '_' ||
               right('0000' || CAST(o.o_custkey AS VARCHAR), 4) AS proxy_id
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT d.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_matched
    FROM staging s JOIN dim d ON s.proxy_id = d.proxy_id
    GROUP BY d.c_nationkey
    """,
    doc="O26 S2:61 / P-PAT:108: join on concat_ws composite proxy with "
    "RIGHT(CONCAT('0000',cc),4) zero-pad (M1 zero_pad_last).",
)
def composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the composite key is computed during the scan (codegen), the
    join shuffles on it like any equi key. Collision note: last-4 padding
    is the reference's own (lossy) convention — kept verbatim."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    proxy = tsql.concat_nullsafe(
        F.col("c_nationkey").cast("string"),
        tsql.zero_pad_last(F.col("c_custkey")),
        sep="_",
    )
    dim = customer.select(proxy.alias("proxy_id"), "c_custkey", "c_nationkey")
    staging = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            tsql.concat_nullsafe(
                F.col("c_nationkey").cast("string"),
                tsql.zero_pad_last(F.col("o_custkey")),
                sep="_",
            ).alias("proxy_id")
        )
        .distinct()
    )
    return (
        staging.join(dim, "proxy_id")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


# ---------------------------------------------------------------------------
# O27 — theta self-join duplicate resolution (P-PAT:53-55)
# ---------------------------------------------------------------------------


@register(
    "theta_selfjoin_max_txn",
    oracle="""
    WITH counts AS (
        SELECT o_custkey, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS txn_count
        FROM orders GROUP BY 1, 2
    )
    SELECT t1.o_custkey, t1.o_orderpriority, t1.txn_count
    FROM counts t1 LEFT JOIN counts t2
      ON t1.o_custkey = t2.o_custkey AND t2.txn_count > t1.txn_count
    WHERE t2.o_custkey IS NULL
    """,
    doc="O27 P-PAT:53-55: keep rows where no other row of the same key has "
    "a greater count — theta (>) self-join, ties all kept (T-SQL parity).",
)
def theta_selfjoin_max_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept as a literal theta self-join for parity; the window-function
    rewrite (max over partition) is what production code should use — see
    ``top1_per_group``. Scale: self-join shuffles both sides on o_custkey
    (equi part of the condition), theta part evaluated post-shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("txn_count")
    )
    t1, t2 = counts.alias("t1"), counts.alias("t2")
    return (
        t1.join(
            t2,
            (F.col("t1.o_custkey") == F.col("t2.o_custkey"))
            & (F.col("t2.txn_count") > F.col("t1.txn_count")),
            "left_anti",
        )
        .select("o_custkey", "o_orderpriority", "txn_count")
    )


# ---------------------------------------------------------------------------
# O28 — disjunctive (OR) join → union-of-equi-joins (P-RES:448-451)
# ---------------------------------------------------------------------------


@register(
    "or_join_name_variants",
    oracle="""
    WITH lhs AS (
        SELECT s_suppkey, s_name, replace(s_name, '#', '-') AS alt_name
        FROM supplier
    ),
    rhs AS (
        SELECT CASE WHEN s_suppkey % 2 = 0 THEN replace(s_name, '#', '-')
                    ELSE s_name END AS gname,
               s_suppkey AS gkey
        FROM supplier
    ),
    matched AS (
        SELECT l.s_suppkey, r.gkey,
               CASE WHEN l.s_name = r.gname THEN 0 ELSE 1 END AS branch,
               ROW_NUMBER() OVER (
                   PARTITION BY l.s_suppkey, l.s_name, l.alt_name
                   ORDER BY CASE WHEN l.s_name = r.gname THEN 0 ELSE 1 END
               ) AS rn
        FROM lhs l JOIN rhs r
          ON l.s_name = r.gname OR l.alt_name = r.gname
    )
    SELECT s_suppkey, gkey FROM matched WHERE rn = 1
    """,
    doc="O28 P-RES:448-451: 4-way OR join condition rewritten as a union of "
    "equi-joins with first-disjunct-wins dedup — never a nested-loop plan.",
)
def or_join_name_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lhs = supplier.select(
        "s_suppkey", "s_name", F.replace(F.col("s_name"), F.lit("#"), F.lit("-")).alias("alt_name")
    )
    rhs = supplier.select(
        F.when(F.col("s_suppkey") % 2 == 0, F.replace(F.col("s_name"), F.lit("#"), F.lit("-")))
        .otherwise(F.col("s_name"))
        .alias("gname"),
        F.col("s_suppkey").alias("gkey"),
    )
    out = or_join(
        lhs,
        rhs,
        key_pairs=[
            (F.col("s_name"), F.col("gname")),
            (F.col("alt_name"), F.col("gname")),
        ],
    )
    return out.select("s_suppkey", "gkey")


# ---------------------------------------------------------------------------
# O29 — fuzzy prefix join (script.sql S3:54-59)
# ---------------------------------------------------------------------------


@register(
    "fuzzy_prefix_join",
    oracle="""
    SELECT left(p1.p_name, 5) AS prefix, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM part p1 JOIN part p2
      ON left(p1.p_name, 5) = left(p2.p_name, 5)
     AND p1.p_partkey < p2.p_partkey
    WHERE p1.p_name LIKE '%e%'
    GROUP BY 1
    """,
    doc="O29 S3:54-59: LIKE filter + LEFT(x,5)=LEFT(y,5) manual fuzzy match "
    "— equi-join on the substring expression, never a cartesian.",
)
def fuzzy_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p1 = part.select(
        F.col("p_partkey").alias("k1"),
        F.col("p_name").alias("n1"),
        F.substring("p_name", 1, 5).alias("prefix"),
    ).filter(F.col("n1").like("%e%"))
    p2 = part.select(
        F.col("p_partkey").alias("k2"), F.substring("p_name", 1, 5).alias("prefix")
    )
    return (
        p1.join(p2, "prefix")
        .filter(F.col("k1") < F.col("k2"))
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# O18 — LIKE patterns incl. wildcard semantics (S2:27,36; S3:58,75)
# ---------------------------------------------------------------------------


@register(
    "like_patterns",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n
    FROM part
    WHERE p_name LIKE '_e%'        -- single-char wildcard
      AND p_name NOT LIKE '%bolt%' -- negated contains
      AND p_name LIKE '%e_'        -- trailing single-char
    GROUP BY p_brand
    """,
    doc="O18: LIKE '%x%' / NOT LIKE with _ single-char wildcards; T-SQL's "
    "bracket-escape [_] ≡ escaped underscore (unit-tested in M1).",
)
def like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_name").like("_e%")
            & ~F.col("p_name").like("%bolt%")
            & F.col("p_name").like("%e_")
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.8 — scalar-function surface: NULL/blank normalization, REPLACE chains
# ---------------------------------------------------------------------------


@register(
    "null_blank_normalization",
    oracle="""
    WITH dirty AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN ''
                    WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE c_mktsegment END AS seg
        FROM customer
    )
    SELECT COALESCE(NULLIF(TRIM(seg), ''), 'UNKNOWN') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dirty GROUP BY 1
    """,
    doc="R1/§2.8 S1:71-78, S2:63: IIF-empty→NULL + ISNULL default — "
    "null_if_blank + coalesce shim over dirty segment labels.",
)
def null_blank_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    dirty = customer.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(""))
        .when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    return (
        dirty.select(
            F.coalesce(tsql.null_if_blank("seg"), F.lit("UNKNOWN")).alias("segment")
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "replace_chain_normalize",
    oracle="""
    SELECT trim(replace(replace(replace(replace(p_name,
               'small', ''), 'red', ''), '  ', ' '), 'widget', 'WIDGET')) AS cleaned,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM part GROUP BY 1
    """,
    doc="§2.8 S4:19-20 / P-RES:225: nested-REPLACE normalization chain "
    "(14-deep in the reference) as a left fold of F.replace.",
)
def replace_chain_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    cleaned = tsql.clean_chain(
        F.col("p_name"),
        [("small", ""), ("red", ""), ("  ", " "), ("widget", "WIDGET")],
    )
    return (
        part.select(F.trim(cleaned).alias("cleaned"))
        .groupBy("cleaned")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# O15/O16/O17 — IN-list whitelist + compound boolean + NULL predicates
# (S1:93-102: the stage-1 country/MCC/testcard filter block)
# ---------------------------------------------------------------------------


@register(
    "in_list_whitelist",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name IN ('FRANCE', 'GERMANY', 'CANADA', 'BRAZIL')
      AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND (o.o_orderstatus = 'F' OR o.o_totalprice > 100000)
      AND o.o_orderdate IS NOT NULL
    GROUP BY n.n_name
    """,
    doc="O15/O16/O17 S1:93-102: IN-list whitelists (country + MCC shape), "
    "parenthesized AND/OR, IS NOT NULL — the reference's stage-1 scope "
    "filter block.",
)
def in_list_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All predicates are sargable: the isin/equality/null tests reach the
    parquet scan as PushedFilters (In, EqualTo, IsNotNull — asserted in
    tests/test_plans.py), so at 100 TB the whitelist prunes row groups
    before any join runs; both dims broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 100000))
            & F.col("o_orderdate").isNotNull()
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(
                nation.filter(F.col("n_name").isin("FRANCE", "GERMANY", "CANADA", "BRAZIL"))
            ),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("spend"),
        )
    )


# ---------------------------------------------------------------------------
# Engine extension: type-2 slowly-changing dimension (the reference keeps
# type-1 latest-value dims — P-PAT upserts overwrite; SCD2 adds history)
# ---------------------------------------------------------------------------

SCD2_INIT_FROM = 19950101
SCD2_EFFECTIVE = 20240601
SCD2_OPEN = 99991231


@register(
    "scd2_patron_segments",
    oracle=f"""
    WITH cur AS (
        SELECT c_custkey, c_mktsegment,
               {SCD2_INIT_FROM} AS valid_from, {SCD2_OPEN} AS valid_to
        FROM customer
    ),
    changes AS (
        SELECT c_custkey, 'MOVED' AS c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'NEWSEG' FROM customer WHERE c_custkey < 5
    ),
    closed AS (
        SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
               {SCD2_EFFECTIVE} AS valid_to, CAST(0 AS BIGINT) AS is_current
        FROM cur c JOIN changes g USING (c_custkey)
        WHERE c.c_mktsegment IS DISTINCT FROM g.c_mktsegment
    ),
    new_versions AS (
        SELECT c.c_custkey, g.c_mktsegment, {SCD2_EFFECTIVE} AS valid_from,
               {SCD2_OPEN} AS valid_to, CAST(1 AS BIGINT) AS is_current
        FROM cur c JOIN changes g USING (c_custkey)
        WHERE c.c_mktsegment IS DISTINCT FROM g.c_mktsegment
    ),
    kept AS (
        SELECT c.c_custkey, c.c_mktsegment, c.valid_from, c.valid_to,
               CAST(1 AS BIGINT) AS is_current
        FROM cur c LEFT JOIN changes g USING (c_custkey)
        WHERE g.c_custkey IS NULL
           OR c.c_mktsegment IS NOT DISTINCT FROM g.c_mktsegment
    ),
    brand_new AS (
        SELECT g.c_custkey, g.c_mktsegment, {SCD2_EFFECTIVE} AS valid_from,
               {SCD2_OPEN} AS valid_to, CAST(1 AS BIGINT) AS is_current
        FROM changes g LEFT JOIN cur c USING (c_custkey)
        WHERE c.c_custkey IS NULL
    )
    SELECT * FROM closed UNION ALL SELECT * FROM new_versions
    UNION ALL SELECT * FROM kept UNION ALL SELECT * FROM brand_new
    """,
    doc="Type-2 SCD upsert on the patron dimension: a change batch closes "
    "differing current versions at the effective datekey and opens new "
    "ones (half-open [from, to) validity), no-ops identical rows, and "
    "inserts unknown keys — dimension history the reference's type-1 "
    "overwrites discard.",
)
def scd2_patron_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One null-safe current⋈changes join + unions (operator
    ``scd2_apply``); history rows are untouched, so cost is
    current-cardinality × change-batch regardless of history depth."""
    from etl_loading_scripts_spark.operators import scd2_apply

    customer = load_table(spark, sf_dir, "customer")
    dim = customer.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(SCD2_INIT_FROM).alias("valid_from"),
        F.lit(SCD2_OPEN).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = customer.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("MOVED").alias("c_mktsegment")
    ).unionByName(
        customer.filter(F.col("c_custkey") < 5).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.lit("NEWSEG").alias("c_mktsegment"),
        )
    )
    out = scd2_apply(
        dim,
        changes,
        on=["c_custkey"],
        tracked=["c_mktsegment"],
        effective_datekey=SCD2_EFFECTIVE,
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        "valid_from",
        "valid_to",
        F.col("is_current").cast("bigint").alias("is_current"),
    )


PIT_CHANGE_TS = "2024-01-15 00:00:00"  # mid-window segment change


@register(
    "pit_join_segment_at_event",
    oracle=f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    dim AS (
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer c JOIN users u ON c.c_custkey = u.user_id
    ),
    versions AS (
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
               TIMESTAMP '{PIT_CHANGE_TS}' AS valid_to
        FROM dim WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, 'MOVED',
               TIMESTAMP '{PIT_CHANGE_TS}', TIMESTAMP '9999-12-31 00:00:00'
        FROM dim WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '1990-01-01 00:00:00', TIMESTAMP '9999-12-31 00:00:00'
        FROM dim WHERE c_custkey % 3 <> 0
    )
    SELECT e.user_id, v.segment AS segment_at_event,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events e JOIN versions v
      ON e.user_id = v.c_custkey
     AND e.ts >= v.valid_from AND e.ts < v.valid_to
    GROUP BY 1, 2
    """,
    doc="Point-in-time-correct join (the feature-store operator): each "
    "event picks the dimension version whose [valid_from, valid_to) "
    "window contains its timestamp - leakage-free training features; "
    "users changing segment mid-window split their event counts.",
)
def pit_join_segment_at_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF semantics against an SCD2-shaped dim (same half-open
    validity as scd2_apply): the equi-key hash join carries the range
    predicate as its post-filter, so cost is |events| x versions-per-key
    (small constant), never a time-range blowup. This is THE correctness
    operator for training-data pipelines - joining today's dimension
    value onto historical events leaks the future into features.

    The versioned dim is built in-query (real SCD2 tables come from
    scd2_apply); the dim slice is a left-semi join on the active users,
    not a hard-coded key range."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    dim = cust.join(
        ev.select(F.col("user_id").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_semi",
    ).select("c_custkey", "c_mktsegment")
    lo, chg, hi = "1990-01-01 00:00:00", PIT_CHANGE_TS, "9999-12-31 00:00:00"

    def version(df, seg_col, frm, to):
        return df.select(
            "c_custkey",
            seg_col.alias("segment"),
            F.to_timestamp(F.lit(frm)).alias("valid_from"),
            F.to_timestamp(F.lit(to)).alias("valid_to"),
        )

    changed = dim.filter(F.col("c_custkey") % 3 == 0)
    stable = dim.filter(F.col("c_custkey") % 3 != 0)
    versions = (
        version(changed, F.col("c_mktsegment"), lo, chg)
        .unionByName(version(changed, F.lit("MOVED"), chg, hi))
        .unionByName(version(stable, F.col("c_mktsegment"), lo, hi))
    )
    return (
        ev.join(
            versions,
            (F.col("user_id") == F.col("c_custkey"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("ts") < F.col("valid_to")),
        )
        .groupBy("user_id", F.col("segment").alias("segment_at_event"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# O47 extension — TOP n PERCENT WITH TIES (the other T-SQL TOP shape)
# ---------------------------------------------------------------------------

TOP_PCT = 10  # SELECT TOP 10 PERCENT ... WITH TIES


@register(
    "top_percent_with_ties",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT custkey, CAST(total AS DOUBLE) AS total_spend,
               RANK() OVER (ORDER BY total DESC) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM spend
    )
    SELECT custkey, total_spend
    FROM ranked
    WHERE rk <= CAST(CEIL(n * {TOP_PCT} / 100.0) AS BIGINT)
    """,
    doc=f"T-SQL ``SELECT TOP {TOP_PCT} PERCENT WITH TIES``: the top decile "
    "of customers by exact-decimal spend, where every row tying the "
    "cutoff value is kept (RANK, not ROW_NUMBER — the WITH TIES "
    "semantics) and the cutoff count is CEIL(n·pct) per the T-SQL spec.",
)
def top_percent_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The percent form needs the population count; it rides the same
    window pass as the rank (COUNT() OVER ()), so the plan is one
    aggregate + one window — at dimension grain here. At fact grain the
    rank swaps for the range-bucketed global rank (operators/ranks) and
    the count for a scalar agg, same as every other global-ordering
    operator in this engine; ties-at-the-cutoff semantics carry over
    unchanged because RANK assigns equal ranks to equal keys in both
    formulations."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("total")
    )
    w = Window.orderBy(F.col("total").desc())
    ranked = spend.select(
        "custkey",
        F.col("total").cast("double").alias("total_spend"),
        F.rank().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.filter(
        F.col("rk") <= F.ceil(F.col("n") * TOP_PCT / 100.0).cast("bigint")
    ).select("custkey", "total_spend")


# ---------------------------------------------------------------------------
# OFFSET/FETCH pagination — and the keyset form that survives scale
# ---------------------------------------------------------------------------

PAGE_SIZE = 10
PAGE_SKIP = 20  # page 3: rows 21-30 of the spend ranking


@register(
    "keyset_pagination_page",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total
        FROM orders GROUP BY 1
    )
    SELECT custkey, CAST(total AS DOUBLE) AS total_spend
    FROM spend
    ORDER BY total DESC, custkey
    LIMIT {PAGE_SIZE} OFFSET {PAGE_SKIP}
    """,
    doc=f"Pagination page 3 (rows {PAGE_SKIP + 1}-{PAGE_SKIP + PAGE_SIZE} "
    "of the customer spend ranking): the oracle states it as T-SQL-style "
    "OFFSET/FETCH, the Spark side executes the KEYSET form — filter past "
    "the previous page's last (total, custkey) key, then take one page — "
    "proving the two formulations select identical rows.",
)
def keyset_pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why keyset: OFFSET n scans and discards n rows EVERY page — page
    10,000 of a 100 TB ranking costs a 10,000-page scan, and rows
    shifting between requests skips/duplicates entries. The keyset form
    is O(page) per page off a range-sorted layout (write_range_sorted's
    non-overlapping file stats prune straight to the boundary) and is
    stable under concurrent inserts. The boundary fetch here is the
    OFFSET form run once (two-scalar collect, O38 discipline) — in a
    real serving path the client passes the previous page's last key
    back, and no offset scan ever runs."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("total")
    )
    # ascending composite sort key equivalent to (total DESC, custkey ASC)
    key = F.struct((-F.col("total")).alias("nt"), F.col("custkey").alias("ck"))
    boundary = (
        spend.orderBy(key)
        .limit(PAGE_SKIP)
        .agg(F.max(key).alias("b"))
        .first()["b"]
    )
    page = (
        spend.filter(
            key > F.struct(
                F.lit(boundary["nt"]).cast(spend.schema["total"].dataType).alias("nt"),
                F.lit(boundary["ck"]).alias("ck"),
            )
        )
        .orderBy(key)
        .limit(PAGE_SIZE)
    )
    return page.select("custkey", F.col("total").cast("double").alias("total_spend"))


@register(
    "inferred_member_backfill",
    oracle="""
    WITH dim0 AS (
        -- dimension before the load: every 7th customer hasn't arrived yet
        SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS nationkey
        FROM customer WHERE c_custkey % 7 <> 0
    ),
    fact_keys AS (SELECT DISTINCT o_custkey FROM orders),
    inferred AS (
        -- step 1: facts referencing unknown keys insert INFERRED members
        -- (sentinel attributes), so the fact load never drops rows
        SELECT f.o_custkey AS c_custkey,
               'UNKNOWN' AS c_name, CAST(-1 AS BIGINT) AS nationkey
        FROM fact_keys f LEFT JOIN dim0 d ON d.c_custkey = f.o_custkey
        WHERE d.c_custkey IS NULL
    ),
    late AS (
        -- step 2: the late dimension feed arrives for HALF the stragglers
        SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS nationkey
        FROM customer WHERE c_custkey % 14 = 0
    ),
    dim2 AS (
        SELECT d.c_custkey,
               COALESCE(l.c_name, d.c_name) AS c_name,
               COALESCE(l.nationkey, d.nationkey) AS nationkey,
               CASE
                   WHEN d.c_name <> 'UNKNOWN' THEN 'known'
                   WHEN l.c_custkey IS NOT NULL THEN 'backfilled'
                   ELSE 'inferred_pending'
               END AS status
        FROM (SELECT * FROM dim0 UNION ALL SELECT * FROM inferred) d
        LEFT JOIN late l ON l.c_custkey = d.c_custkey AND d.c_name = 'UNKNOWN'
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(DISTINCT nationkey) AS BIGINT) AS n_nations,
           CAST((SELECT COUNT(*) FROM orders o JOIN dim2 x
                 ON x.c_custkey = o.o_custkey AND x.status = dim2.status)
                AS BIGINT) AS n_orders_served
    FROM dim2 GROUP BY 1
    """,
    doc="Late-arriving dimension (Kimball inferred members): facts "
    "referencing customers the dimension hasn't loaded yet INSERT "
    "sentinel-attributed placeholder rows (left-anti guarded append, "
    "O20) so the fact load never drops or dangles; when the late "
    "dimension feed lands, a guarded UPDATE…FROM (O5 + O19 sentinel "
    "guard: only UNKNOWN rows are writable) backfills real attributes "
    "without touching properly-loaded members. Per-status member/"
    "nation/served-order counts.",
)
def inferred_member_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the reference's own idioms end-to-end: the anti-join
    insert is S2:23-28's guarded append, the backfill is S2:31-37's
    UPDATE…FROM behind S4:102-107's overwrite-prevention guard. Scale:
    the missing-key scan is one distinct over the fact's FK column
    (shuffle on the key), the inferred insert is dimension-sized, and
    the backfill joins dimension-to-feed — fact data is touched exactly
    once, at the final serving rollup."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim0 = customer.filter(F.col("c_custkey") % 7 != 0).select(
        "c_custkey", "c_name", F.col("c_nationkey").cast("bigint").alias("nationkey")
    )
    fact_keys = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    inferred_src = fact_keys.select(
        "c_custkey", F.lit("UNKNOWN").alias("c_name"),
        F.lit(-1).cast("bigint").alias("nationkey"),
    )
    dim1 = insert_if_absent(dim0, inferred_src, on=["c_custkey"])

    late = customer.filter(F.col("c_custkey") % 14 == 0).select(
        "c_custkey",
        F.col("c_name").alias("late_name"),
        F.col("c_nationkey").cast("bigint").alias("late_nationkey"),
    )
    dim2 = update_from_join(
        dim1.withColumn("was_inferred", F.col("c_name") == "UNKNOWN"),
        late,
        on=["c_custkey"],
        set_cols={"c_name": "late_name", "nationkey": "late_nationkey"},
        guard=F.col("c_name") == "UNKNOWN",  # O19: known members immutable
    )
    dim2 = dim2.withColumn(
        "status",
        F.when(~F.col("was_inferred"), "known")
        .when(F.col("c_name") != "UNKNOWN", "backfilled")
        .otherwise("inferred_pending"),
    )
    served = (
        orders.join(
            F.broadcast(dim2.select(F.col("c_custkey").alias("o_custkey"), "status")),
            "o_custkey",
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders_served"))
    )
    return (
        dim2.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.countDistinct("nationkey").cast("bigint").alias("n_nations"),
        )
        .join(served, "status")
        .select("status", "n_members", "n_nations", "n_orders_served")
    )


@register(
    "cuisine_impute_cascade",
    oracle="""
    WITH base AS (
        SELECT p_partkey, p_brand,
               CASE WHEN p_partkey % 9 = 0 THEN 'N/A' ELSE p_type END AS ptype
        FROM part
    ),
    partner_pick AS (
        -- CT:11-27: prefer the partner row's value, rank by Type
        SELECT p_brand, MIN(ptype) AS partner_type
        FROM base WHERE p_partkey % 5 = 0 AND ptype <> 'N/A'
        GROUP BY 1
    ),
    modal_pick AS (
        -- CT:28-46: else the brand's modal value (count DESC, tie by type)
        SELECT p_brand, ptype AS modal_type
        FROM (
            SELECT p_brand, ptype,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_brand
                       ORDER BY COUNT(*) DESC, ptype
                   ) AS rn
            FROM base WHERE ptype <> 'N/A'
            GROUP BY p_brand, ptype
        ) WHERE rn = 1
    ),
    imputed AS (
        SELECT b.p_partkey, b.p_brand, b.ptype,
               CASE WHEN b.ptype <> 'N/A' THEN 'original'
                    WHEN pp.partner_type IS NOT NULL THEN 'partner'
                    WHEN mp.modal_type IS NOT NULL THEN 'modal'
                    ELSE 'unimputed' END AS source
        FROM base b
        LEFT JOIN partner_pick pp ON pp.p_brand = b.p_brand
        LEFT JOIN modal_pick mp ON mp.p_brand = b.p_brand
    ),
    rollup_src AS (
        SELECT source AS category,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands
        FROM imputed GROUP BY 1
    ),
    discrepancy AS (
        -- CT:82-137: brands where the two strategies disagree
        SELECT 'partner_modal_discrepancy' AS category,
               CAST(COALESCE(SUM(n_na), 0) AS BIGINT) AS n_parts,
               CAST(COUNT(*) AS BIGINT) AS n_brands
        FROM (
            SELECT pp.p_brand,
                   (SELECT COUNT(*) FROM base b
                    WHERE b.p_brand = pp.p_brand AND b.ptype = 'N/A') AS n_na
            FROM partner_pick pp JOIN modal_pick mp ON mp.p_brand = pp.p_brand
            WHERE pp.partner_type <> mp.modal_type
        )
    )
    SELECT * FROM rollup_src
    UNION ALL
    SELECT * FROM discrepancy
    """,
    doc="Entry point C's cuisine-imputation cascade (CT end-to-end): "
    "'N/A' values imputed per brand by the two-wave preference — the "
    "partner row's value when one exists (rank by type, CT:11-27), else "
    "the brand's modal value (CT:28-46); brands whose rows are all N/A "
    "stay honestly unimputed (CT:198-203); plus the partner-vs-modal "
    "discrepancy report (CT:82-137) that decides whether the preferred "
    "strategy can be trusted. Rolled up per imputation source.",
)
def cuisine_impute_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the same primitives the standalone queries exercise
    (rank-by-preference O43, modal-per-group O45, guarded update O5/O19)
    into the reference script's actual flow. Scale: both picks are
    brand-grain aggregates (bounded dimension), broadcast back over the
    part table — one shuffle for the modal count, everything else
    map-side; the discrepancy report is a brand-grain join of the two
    pick tables."""
    part = load_table(spark, sf_dir, "part")
    base = part.select(
        "p_partkey",
        "p_brand",
        F.when(F.col("p_partkey") % 9 == 0, "N/A").otherwise(F.col("p_type")).alias(
            "ptype"
        ),
    )
    partner_pick = (
        base.filter((F.col("p_partkey") % 5 == 0) & (F.col("ptype") != "N/A"))
        .groupBy("p_brand")
        .agg(F.min("ptype").alias("partner_type"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("cnt"), "ptype")
    modal_pick = (
        base.filter(F.col("ptype") != "N/A")
        .groupBy("p_brand", "ptype")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("ptype").alias("modal_type"))
    )
    imputed = (
        base.join(F.broadcast(partner_pick), "p_brand", "left")
        .join(F.broadcast(modal_pick), "p_brand", "left")
        .withColumn(
            "source",
            F.when(F.col("ptype") != "N/A", "original")
            .when(F.col("partner_type").isNotNull(), "partner")
            .when(F.col("modal_type").isNotNull(), "modal")
            .otherwise("unimputed"),
        )
    )
    rollup = imputed.groupBy(F.col("source").alias("category")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.countDistinct("p_brand").cast("bigint").alias("n_brands"),
    )
    na_per_brand = (
        base.filter(F.col("ptype") == "N/A")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_na"))
    )
    disc_brands = (
        partner_pick.join(modal_pick, "p_brand")
        .filter(F.col("partner_type") != F.col("modal_type"))
        .join(F.broadcast(na_per_brand), "p_brand", "left")
    )
    discrepancy = disc_brands.agg(
        F.lit("partner_modal_discrepancy").alias("category"),
        F.coalesce(F.sum("n_na"), F.lit(0)).cast("bigint").alias("n_parts"),
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
    )
    return rollup.unionByName(discrepancy)
