"""Change-data-capture changelog application (compact-then-merge).

The reference applies changes to dimensions with per-statement MERGE /
UPDATE…FROM runs (e.g. ``UpdtMapDimPatron.sql`` (P-PAT), SURVEY §2.2). A
CDC feed generalizes that: an *ordered log* of upsert/delete records per
key, which must be **compacted** (latest op per key wins) before a single
merge against the snapshot — the Debezium/Kafka-connect "apply changelog
to table" shape, and the core of every streaming-lakehouse sink
(Delta CDF, Iceberg upsert, Hudi).

Scale (100 TB): compaction is ONE window shuffle on the key (row_number
over (key ORDER BY seq DESC) = 1); the merge is one join of snapshot ×
compacted log — sort-merge on the key, broadcast when the day's log is
small relative to the snapshot, AQE-skew-safe. The log is never collected
and never replayed row-by-row: a billion-row backlog compacts in the same
two stages as a thousand-row one.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register


def compact_changelog(
    log: DataFrame,
    keys: Sequence[str],
    seq: Sequence[str],
) -> DataFrame:
    """Reduce an ordered changelog to its final record per key.

    ``seq`` columns define the total order (latest wins); ties must be
    broken by a unique column (pass it last). One shuffle on ``keys``.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq])
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    target: DataFrame,
    log: DataFrame,
    key: Mapping[str, str],
    op_col: str,
    seq: Sequence[str],
    set_cols: Mapping[str, Column],
    delete_op: str = "D",
) -> DataFrame:
    """Apply a compacted CDC log to a snapshot.

    ``key`` maps target key column → log key column. Rows whose final op
    is ``delete_op`` disappear; other log rows upsert via ``set_cols``
    (expressions over the joined frame). Untouched snapshot rows pass
    through unchanged. Adds an ``action`` column
    (kept / updated / inserted) so callers can audit the merge.
    """
    last = compact_changelog(log, list(key.values()), seq)
    # Presence markers, not key-nullability (ADVICE r1 on merge_upsert).
    tgt = target.withColumn("__tgt", F.lit(True))
    src = last.withColumn("__src", F.lit(True))
    joined = tgt.join(src, [tgt[t].eqNullSafe(src[s]) for t, s in key.items()], "full_outer")
    alive = joined.filter(
        F.col("__src").isNull() | (F.col(op_col) != F.lit(delete_op))
    )
    out_key = [
        F.coalesce(tgt[t], src[s]).alias(t) for t, s in key.items()
    ]
    action = (
        F.when(F.col("__src").isNull(), F.lit("kept"))
        .when(F.col("__tgt").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    applied = [
        F.when(F.col("__src").isNull(), F.col(c)).otherwise(expr).alias(c)
        for c, expr in set_cols.items()
    ]
    return alive.select(*out_key, *applied, action.alias("action"))


@register(
    "cdc_apply_changelog",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'signup' THEN 'U' ELSE 'D' END AS op,
               value
        FROM events
        WHERE event_type IN ('signup', 'error')
    ),
    last AS (
        SELECT user_id, op, value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rn
            FROM log
        )
        WHERE rn = 1
    )
    SELECT COALESCE(c.c_custkey, l.user_id) AS c_custkey,
           CASE WHEN l.user_id IS NULL THEN c.c_acctbal ELSE l.value END
               AS acctbal,
           CASE WHEN l.user_id IS NULL THEN 'kept'
                WHEN c.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS action
    FROM customer c
    FULL OUTER JOIN last l ON c.c_custkey = l.user_id
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
    doc="CDC compact-then-merge: the events feed interpreted as an ordered "
    "changelog over the customer dimension (signup=upsert of value, "
    "error=delete; latest (ts, event_id) wins per key), applied in one "
    "window + one full-outer merge.",
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: see module docstring — compaction is one key-shuffle window,
    the merge one key join; nothing is collected or replayed. The driver
    feed here is synthetic (events as the log) but the operator is the
    real one a streaming sink would call per micro-batch."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("acctbal")
    )
    ev = load_table(spark, sf_dir, "events")
    log = ev.filter(F.col("event_type").isin("signup", "error")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("U"))
        .otherwise(F.lit("D"))
        .alias("op"),
        "value",
    )
    return apply_changelog(
        cust,
        log,
        key={"c_custkey": "user_id"},
        op_col="op",
        seq=["ts", "event_id"],
        set_cols={"acctbal": F.col("value")},
    )


@register(
    "scd2_rebuild_from_changelog",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id, value,
           epoch_us(ts) AS valid_from_us,
           COALESCE(
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), -1) AS valid_to_us,
           CAST(CASE WHEN lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM log
    """,
    doc="SCD2 history REBUILD: the full ordered changelog (purchase "
    "events as value updates per user) becomes the complete type-2 "
    "dimension in one pass — valid_from = change time, valid_to = next "
    "change time via lead() (−1 sentinel = open), half-open [from,to) "
    "versions. Complements scd2_apply (operators/mutations.py), which "
    "advances an EXISTING dim by one delta batch.",
)
def scd2_rebuild_from_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The backfill path for versioned dimensions: when history must be
    reconstructed (new column, corrupted dim, first adoption of SCD2),
    replaying deltas through scd2_apply is O(batches) passes; the
    rebuild is ONE shuffle on the entity key + one lead() window —
    optimal at any scale since versions of a key are adjacent after the
    shuffle. Microsecond epochs keep [from,to) boundaries exact; the
    open version carries -1 (oracle-hashable, no NULL-vs-NaT ambiguity).

    Reference parity: the monthly snapshot rebuild idiom (SURVEY §4's
    'full refresh' loads) generalized to per-change granularity."""
    ev = load_table(spark, sf_dir, "events")
    log = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_micros("ts")).over(w)
    return log.select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros("ts").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(-1)).alias("valid_to_us"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("long").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff (round 3): what changed between two published versions
# ---------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots of the same table: one output row
    per key present in either side, with ``diff_status`` ∈
    {added, removed, changed, unchanged}.

    The audit companion to ``publish_versioned`` (what changed between
    v=N-1 and v=N?) and the reverse of ``apply_changelog`` (reconstruct
    the changelog from states). Comparison is column-by-column null-safe
    equality over ``compare_cols`` (default: all shared non-key columns)
    — no cross-engine struct-hash dependence.

    Scale: ONE full-outer sort-merge join co-partitioned on the key; the
    per-column comparisons are map-side expressions. At 100 TB both
    snapshots shuffle once each — same cost family as the merge that
    produced the new version.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c in set(new.columns) and c not in set(keys)]
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *compare_cols)
    o = o.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = n.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = [o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"]) for k in keys]
    j = o.join(n, cond, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k) for k in keys
    ]
    return j.select(*out_keys, status.alias("diff_status"))


@register(
    "snapshot_diff_audit",
    oracle="""
    WITH old_snap AS (
        SELECT c_custkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 13 <> 0
    ),
    new_snap AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0
                    THEN CAST(c_acctbal + 100 AS DECIMAL(15,2))
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 11 <> 0
    ),
    diff AS (
        SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'added'
                    WHEN n.c_custkey IS NULL THEN 'removed'
                    WHEN o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
                     AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment
                        THEN 'unchanged'
                    ELSE 'changed' END AS diff_status
        FROM old_snap o FULL OUTER JOIN new_snap n USING (c_custkey)
    )
    SELECT diff_status, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM diff GROUP BY 1
    """,
    doc="Version-diff audit: two deterministic snapshots of the customer "
    "dim (removals ≡0 mod 13 old-only, ≡0 mod 11 new-only, balance bumps "
    "≡0 mod 7) diffed row-level via snapshot_diff; counts per "
    "added/removed/changed/unchanged — the 'what changed between v=N-1 "
    "and v=N' audit every versioned publish wants.",
)
def snapshot_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: see snapshot_diff — one co-partitioned full-outer join; the
    rollup here is a 4-row aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    old = cust.filter(F.col("c_custkey") % 13 != 0).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    new = cust.filter(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 7 == 0,
            (F.col("c_acctbal") + 100).cast("decimal(15,2)"),
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )
    diff = snapshot_diff(old, new, ["c_custkey"])
    return diff.groupBy("diff_status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("c_custkey").cast("long").alias("min_key"),
    )


@register(
    "scd2_asof_snapshot",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id, value
        FROM events WHERE event_type = 'purchase'
    ),
    hist AS (
        SELECT user_id, value,
               epoch_us(ts) AS f,
               COALESCE(lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ), -1) AS t
        FROM log
    ),
    mid AS (
        SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS m FROM log
    )
    SELECT h.f // 86400000000 AS from_day,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CAST(h.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM hist h, mid
    WHERE h.f <= mid.m AND (h.t = -1 OR h.t > mid.m)
    GROUP BY 1
    """,
    doc="Point-in-time (as-of) read of the SCD2 dimension: the version of "
    "each user valid at the changelog's midpoint instant — half-open "
    "[valid_from, valid_to) interval containment with the −1 open "
    "sentinel — rolled up by version start day. The time-travel query "
    "every versioned dimension exists to answer.",
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the as-of predicate is a per-row filter over the SCD2 table
    — no join, no window beyond the rebuild itself; with valid_from in
    the partition/sort layout the containment filter prunes to the files
    whose [min,max] straddle the instant. The as-of instant is a
    two-scalar driver aggregate (O38 discipline), a query parameter in
    production."""
    hist = scd2_rebuild_from_changelog(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    log = ev.filter(F.col("event_type") == "purchase")
    lo, hi = log.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    mid = (lo + hi) // 2
    snap = hist.filter(
        (F.col("valid_from_us") <= mid)
        & ((F.col("valid_to_us") == -1) | (F.col("valid_to_us") > mid))
    )
    return snap.groupBy(
        F.expr("valid_from_us div 86400000000").alias("from_day")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
