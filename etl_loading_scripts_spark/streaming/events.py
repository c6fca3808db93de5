"""Streaming operators: windowed aggregation + sessionization.

The reference is a pure monthly batch (SURVEY §2.10) — streaming is part of
the engine's extension surface. Two operators:

- ``stream_windowed_agg`` — a REAL Structured Streaming query: parquet
  ``readStream`` → watermark → tumbling event-time window → memory sink,
  driven to completion with ``processAllAvailable``. Batch-equivalent
  semantics (same window math) make it oracle-checkable.
- ``sessionize_events`` — gap-based sessionization via lag + running sum,
  the batch twin of ``session_window``/``applyInPandasWithState``.

Float discipline: ``value`` sums go through DECIMAL(18,6) so the streaming
sink's values hash-match DuckDB exactly.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table, table_path
from etl_loading_scripts_spark.registry import register
from etl_loading_scripts_spark.streaming.source_util import (
    derived_state_partitions,
    scoped_shuffle_partitions,
    stream_source_dir,
)

SESSION_GAP_MIN = 30
DEC6 = "decimal(18,6)"


@register(
    "stream_windowed_agg",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Structured Streaming: readStream(parquet) → watermark(10 min) → "
    "1-hour tumbling event-time window per event_type → memory sink; "
    "result returned as the completed batch DataFrame.",
)
def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A genuine streaming execution (not batch dressed up): the parquet
    file drives a micro-batch through the watermark + stateful window
    operator. At production scale the same query runs off Kafka with the
    sink swapped; state store size is bounded by watermark horizon ×
    window cardinality.

    outputMode('complete') rather than 'append' so the single micro-batch
    emits every window without waiting for watermark advancement."""
    from etl_loading_scripts_spark.catalog import _normalize_nanos, stream_source_schema

    src = table_path(sf_dir, "events")
    # the streaming file source lists a DIRECTORY; the test table is a
    # single parquet file → expose it through a temp symlink dir (a real
    # deployment points this at a landing directory / Kafka topic)
    stream_dir = stream_source_dir(src, prefix="events_stream")

    raw_schema, nanos_cols = stream_source_schema(spark, src)
    stream = _normalize_nanos(
        spark.readStream.schema(raw_schema).parquet(stream_dir), nanos_cols
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("total_value"),
        )
    )
    sink = f"stream_out_{uuid.uuid4().hex[:8]}"
    # state-store partitions pinned to source volume (r15)
    with scoped_shuffle_partitions(spark, derived_state_partitions(spark, src)):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(sink).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL '{SESSION_GAP_MIN} minutes'
                       THEN 1 ELSE 0 END AS is_new_session
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, event_id, ts, value,
               SUM(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc=f"Gap-based sessionization ({SESSION_GAP_MIN}-min): lag + running "
    "sum session ids, per-session rollup — the batch twin of "
    "session_window / applyInPandasWithState.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on user_id; lag and the running sum share the
    same window sort. Uses window frames (lag / ROWS UNBOUNDED PRECEDING)
    — deliberately beyond the reference's ranking-only window usage.
    CAVEAT: the user-grain window puts a whale user in ONE task (AQE
    cannot split a window key) — ``sessionize_events_bucketed`` is the
    skew-resilient twin with identical output."""
    return sessionize_frame(load_table(spark, sf_dir, "events"))


def sessionize_frame(events: DataFrame) -> DataFrame:
    """Single-pass gap sessionization of an ``(user_id, event_id, ts,
    value)`` frame — the composable core of ``sessionize_events``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                # microsecond-exact gap: cast-to-seconds would truncate and
                # disagree with the oracle's INTERVAL comparison
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new_session"),
    )
    numbered = marked.withColumn(
        "session_seq",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq"))
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("session_value"),
        )
    )


def sessionize_bucketed_frame(events: DataFrame, bucket_hours: int = 24) -> DataFrame:
    """Skew-resilient two-phase sessionization over ``(user_id, event_id,
    ts, value)`` — bit-identical output to the single-window
    ``sessionize_events`` plan (same session_seq numbering), proven by the
    shared oracle and the planted-hot-key equality check in
    ``tools/bench_skew_hot.py``.

    The single-pass plan's scale hazard: ``Window.partitionBy(user_id)``
    puts EVERY event of a user in one task, so a whale user owning 30% of
    the corpus (the reference's 'MC' hot-client shape, ``S1:97``) becomes
    a straggler AQE cannot split — skew-join splits shuffle partitions,
    but a window's key must stay whole. The fix is hierarchical:

    1. window over ``(user_id, time-bucket)`` — the whale's rows spread
       across |buckets| tasks; lag/cumsum are local to the bucket;
    2. per-(user, bucket) stats (first/last event time, local session
       count) — a grain of |users|x|buckets|, tiny vs the event table;
    3. a bucket-level window stitches the boundaries: a bucket whose
       first event is within the gap of the previous bucket's last event
       MERGES its first local session into the previous session, and an
       exclusive running sum of per-bucket session counts converts local
       seq to the exact global numbering: ``global = offset + local_seq
       - merged``.

    Cost: one extra shuffle at the (user, bucket) grain plus the join
    back (which reuses the phase-1 hash partitioning — the big side does
    not re-exchange). Use when user-grain skew is plausible; the plain
    plan is marginally cheaper on uniform data."""
    span_us = bucket_hours * 3600 * 1_000_000
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    ev = events.withColumn("__us__", F.unix_micros("ts")).withColumn(
        "__b__", F.floor(F.col("__us__") / span_us)
    )
    w_local = Window.partitionBy("user_id", "__b__").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "__new__",
        F.when(
            F.lag("__us__").over(w_local).isNull()
            | (F.col("__us__") - F.lag("__us__").over(w_local) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "__lseq__",
        F.sum("__new__").over(w_local.rowsBetween(Window.unboundedPreceding, 0)),
    )
    stats = marked.groupBy("user_id", "__b__").agg(
        F.min("__us__").alias("__first__"),
        F.max("__us__").alias("__last__"),
        F.max("__lseq__").alias("__nloc__"),
    )
    w_b = Window.partitionBy("user_id").orderBy("__b__")
    # NOTE: no broadcast hint on the stats side — |users|x|buckets| is
    # data-dependent; AQE broadcasts when measured size allows.
    stitched = (
        stats.withColumn(
            "__merged__",
            F.when(
                F.lag("__last__").over(w_b).isNotNull()
                & (F.col("__first__") - F.lag("__last__").over(w_b) <= gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__offset__",
            F.coalesce(
                F.sum(F.col("__nloc__") - F.col("__merged__")).over(
                    w_b.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("user_id", "__b__", "__merged__", "__offset__")
    )
    numbered = marked.join(stitched, ["user_id", "__b__"]).withColumn(
        "session_seq",
        (F.col("__offset__") + F.col("__lseq__") - F.col("__merged__")).cast("long"),
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("session_value"),
        )
    )


@register(
    "sessionize_events_bucketed",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL '{SESSION_GAP_MIN} minutes'
                       THEN 1 ELSE 0 END AS is_new_session
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, event_id, ts, value,
               SUM(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_seq
        FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc=f"Skew-resilient sessionization ({SESSION_GAP_MIN}-min gap): the "
    "two-phase bucketed variant of sessionize_events — local windows over "
    "(user, day) spread a whale user across tasks, then a bucket-grain "
    "boundary stitch reproduces the EXACT single-pass session numbering "
    "(same oracle). The defense for user-grain skew a window's "
    "partitionBy key denies AQE (skew-join splits partitions, never a "
    "window key).",
)
def sessionize_events_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the whale-user straggler in the plain plan is the
    measured pathology in SCALING.md's round-5 planted-skew table; this
    plan bounds every window task at (user x bucket_hours) of events
    regardless of how hot one user runs."""
    return sessionize_bucketed_frame(
        load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    )


@register(
    "session_window_native",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL '{SESSION_GAP_MIN} minutes'
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_seq
        FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL '{SESSION_GAP_MIN} minutes',
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc=f"Native session_window({SESSION_GAP_MIN} min) operator — Spark's "
    "built-in gap-based session assignment (window end = last event + gap), "
    "vs the manual lag/running-sum twin in sessionize_events.",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in operator sessionizes inside ObjectHashAggregate — one
    shuffle on user_id, sessions merged per-key without a window sort.
    The same groupBy(session_window(...)) runs unchanged under readStream
    with a watermark (state-store-backed merging); batch mode here keeps
    it oracle-checkable."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "asof_join_last_purchase",
    oracle="""
    WITH purchases AS (
        SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, e.user_id, e.event_type,
           epoch_us(e.ts) AS ts_us,
           epoch_us(p.ts) AS last_purchase_us,
           epoch_us(e.ts) - epoch_us(p.ts) AS gap_us
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="As-of join (Spark has no native operator): every event attributed "
    "to the user's most recent purchase at-or-before it — implemented as "
    "the union + last_value(ignorenulls) window trick; the oracle is "
    "DuckDB's native ASOF LEFT JOIN.",
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalable as-of plan: union the probe rows and (deduped)
    reference rows into one stream, sort once per user_id partition, and
    carry the reference timestamp forward with last_value(ignorenulls).
    ONE shuffle + ONE sort regardless of how many probe rows each
    reference row serves — vs the naive range-join which explodes to
    |events| × |purchases| per user before picking the max. At equal
    timestamps the reference row sorts first (is_ref DESC) so an event
    can attribute to a same-instant purchase, matching ASOF's >= bound.
    At 100 TB both sides shuffle-partition on user_id; no broadcast, no
    skew beyond per-user event counts (salt heavy users if needed)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            F.lit(None).cast("string").alias("event_type"),
            "ts",
            F.col("ts").alias("ref_ts"),
            F.lit(1).alias("is_ref"),
        )
    )
    probes = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.lit(None).cast("timestamp").alias("ref_ts"),
        F.lit(0).alias("is_ref"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_ref").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = probes.unionByName(purchases).withColumn(
        "last_purchase", F.last("ref_ts", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("is_ref") == 0).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("last_purchase").alias("last_purchase_us"),
        (F.unix_micros("ts") - F.unix_micros("last_purchase")).alias("gap_us"),
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_high,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) > 50
    GROUP BY event_type
    """,
    doc="Semi-structured handling: schema'd from_json over the props JSON "
    "column, predicate + aggregation on the extracted field.",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a DECLARED schema (the production path — schema
    inference over JSON double-scans and drifts); the parsed struct stays
    columnar and the k>50 predicate runs codegen'd. At 100 TB: parse once
    in the scan projection, never per-expression; for hot paths promote
    frequently-queried JSON fields to real columns at ingest."""
    events = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JOIN_WINDOW_MIN = 30


@register(
    "stream_stream_join",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lead_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '{JOIN_WINDOW_MIN} minutes'
     AND c.ts <= p.ts
    """,
    doc=f"Stream-stream interval join: purchases ⋈ clicks of the same user "
    f"within the prior {JOIN_WINDOW_MIN} min — watermarks on BOTH sides + "
    "the time-range bound make streaming state evictable; oracle is the "
    "equivalent batch range join.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL stream-stream inner join (two readStreams through one
    micro-batch): Spark buffers each side in the state store and the
    time-range condition + watermark bound how much — without them the
    state grows forever, which is why the range predicate lives in the
    JOIN condition, not a post-filter. Attribution (click→purchase) is the
    canonical production use. Inner-join emission is watermark-independent,
    so the single-batch result is deterministic and oracle-checkable."""
    from etl_loading_scripts_spark.catalog import _normalize_nanos, stream_source_schema

    src = table_path(sf_dir, "events")
    stream_dir = stream_source_dir(src, prefix="events_stream")

    raw_schema, nanos_cols = stream_source_schema(spark, src)

    def side(event_type: str, alias: str):
        return (
            _normalize_nanos(
                spark.readStream.schema(raw_schema).parquet(stream_dir), nanos_cols
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "10 minutes")
        )

    purchases, clicks = side("purchase", "p"), side("click", "c")
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_MIN} MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    sink = f"ssj_out_{uuid.uuid4().hex[:8]}"
    # bounded audit-size stream: fewer state-store instances (see
    # scoped_shuffle_partitions — measured 9.5 s -> 2.1 s at sf0.1)
    with scoped_shuffle_partitions(spark):
        q = joined.writeStream.outputMode("append").format("memory").queryName(sink).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(sink).select(
        F.col("p_id").alias("purchase_id"),
        F.col("c_id").alias("click_id"),
        F.col("p_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lead_us"),
    )


@register(
    "asof_join_next_click",
    oracle="""
    WITH clicks AS (
        SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT e.event_id, e.user_id,
           epoch_us(e.ts) AS ts_us,
           epoch_us(c.ts) AS next_click_us,
           epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') e
    ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND c.ts >= e.ts
    """,
    doc="FORWARD as-of join: every purchase attributed to the user's next "
    "click at-or-after it — the post-conversion-behavior mirror of the "
    "backward as-of; same union + single-sort plan, carrying the "
    "reference backward from the future with first_value(ignorenulls).",
)
def asof_join_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward variant of :func:`asof_join_last_purchase`: the carried
    window flips to ``[current row, unbounded following)`` with
    ``first(ignorenulls)``, and at equal timestamps the reference sorts
    AFTER the probe (is_ref ASC) so a same-instant click is still in the
    probe's following frame — matching ASOF's >= bound. Cost is identical
    to the backward plan: one user_id shuffle, one sort, no range
    explosion."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .distinct()
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.col("ts").alias("ref_ts"),
            F.lit(1).alias("is_ref"),
        )
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("ref_ts"),
        F.lit(0).alias("is_ref"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_ref").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = probes.unionByName(clicks).withColumn(
        "next_click", F.first("ref_ts", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("is_ref") == 0).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("next_click").alias("next_click_us"),
        (F.unix_micros("next_click") - F.unix_micros("ts")).alias("gap_us"),
    )


@register(
    "stream_stream_left_join",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lead_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '{JOIN_WINDOW_MIN} minutes'
     AND c.ts <= p.ts
    """,
    doc=f"Stream-stream LEFT OUTER interval join: every purchase, with its "
    f"prior-{JOIN_WINDOW_MIN}-min clicks or NULL. Outer emission only "
    "happens when the watermark proves no future match can arrive, so the "
    "query closes the watermark with far-future sentinel batches — the "
    "same idle-source watermark advance production pipelines configure — "
    "making the result batch-equivalent and fully hash-checkable.",
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER adds the watermark-emission subtlety the inner join
    doesn't have: an unmatched purchase emits its NULL row only after the
    click-side watermark passes its timestamp (no earlier click can still
    arrive). In a finite file stream the watermark freezes at max(ts) −
    delay and the tail of unmatched rows would sit in state forever, so
    after draining the real data the query appends two sentinel micro-
    batches 1 h and 2 h past the end (watermark computed in batch N
    applies in batch N+1) and drains again — state flushes, sentinels are
    filtered back out by their negative ids.

    Scale: identical state-store behavior to the inner join (both sides
    watermarked, range-bounded state eviction); the sentinel trick is
    test-harness plumbing — a live pipeline gets the same advance from new
    data or idle-source watermarking."""
    from etl_loading_scripts_spark.catalog import _normalize_nanos, stream_source_schema

    src = table_path(sf_dir, "events")
    stream_dir = stream_source_dir(src, prefix="events_lsj", unique=True)

    raw_schema, nanos_cols = stream_source_schema(spark, src)
    max_us = load_table(spark, sf_dir, "events").agg(
        F.max(F.unix_micros("ts"))
    ).first()[0]

    def sentinel_batch(tag: int, offset_hours: int) -> None:
        """One far-future purchase + click (disjoint fake users, negative
        ids) written as a new source file: advances BOTH side watermarks
        without ever joining real rows."""
        rows = []
        for event_id, user_id, etype in ((-1 - tag, -1, "purchase"), (-101 - tag, -2, "click")):
            us = max_us + offset_hours * 3_600_000_000
            ts_val = us * 1000 if "ts" in nanos_cols else __import__("datetime").datetime.utcfromtimestamp(us / 1e6)
            rows.append((event_id, ts_val, user_id, etype, 0.0, None))
        spark.createDataFrame(rows, schema=raw_schema).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)

    def side(event_type: str, alias: str):
        return (
            _normalize_nanos(
                spark.readStream.schema(raw_schema).parquet(stream_dir), nanos_cols
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "10 minutes")
        )

    joined = side("purchase", "p").join(
        side("click", "c"),
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_MIN} MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    )
    sink = f"lsj_out_{uuid.uuid4().hex[:8]}"
    # bounded audit-size stream: 3 drains x state-store instances is pure
    # per-partition overhead (measured 31.5 s -> ~14 s at sf0.1; see
    # scoped_shuffle_partitions)
    with scoped_shuffle_partitions(spark):
        q = joined.writeStream.outputMode("append").format("memory").queryName(sink).start()
        try:
            q.processAllAvailable()
            for tag, hours in ((0, 1), (1, 2)):
                sentinel_batch(tag, hours)
                q.processAllAvailable()
        finally:
            q.stop()
    return (
        spark.table(sink)
        .filter(F.col("p_id") >= 0)
        .select(
            F.col("p_id").alias("purchase_id"),
            F.col("c_id").alias("click_id"),
            F.col("p_user").alias("user_id"),
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lead_us"),
        )
    )


@register(
    "stream_dedup_events",
    oracle="""
    WITH ranked AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
        FROM events
    )
    SELECT event_id, user_id, event_type, ts_us FROM ranked WHERE rn = 1
    """,
    doc="Streaming dedup: dropDuplicates on event_id inside a watermarked "
    "stream — the at-least-once→exactly-once repair every Kafka ingest "
    "needs; state evicted once the watermark passes an id's event time.",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a stream keeps per-key state; the watermark bounds
    it (ids older than the horizon are forgotten — safe because replays
    arrive within the lateness bound). Batch semantics = keep the first
    occurrence per event_id; the synthetic table has unique event_ids so
    both engines agree trivially on content and the streaming machinery
    (state store + eviction) is what's being exercised."""
    from etl_loading_scripts_spark.catalog import _normalize_nanos, stream_source_schema

    src = table_path(sf_dir, "events")
    stream_dir = stream_source_dir(src, prefix="events_stream")

    raw_schema, nanos_cols = stream_source_schema(spark, src)
    stream = (
        _normalize_nanos(
            spark.readStream.schema(raw_schema).parquet(stream_dir), nanos_cols
        )
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id"])
    )
    sink = f"dedup_out_{uuid.uuid4().hex[:8]}"
    # state-store partitions pinned to source volume (r15)
    with scoped_shuffle_partitions(spark, derived_state_partitions(spark, src)):
        q = stream.writeStream.outputMode("append").format("memory").queryName(sink).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(sink).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )


@register(
    "rolling_7day_user_value",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d
    FROM events
    """,
    doc="RANGE-frame window: per-user trailing-7-day value sum keyed on "
    "event time (peers at the same instant share the frame) — the rolling "
    "feature every behavioral model input pipeline computes.",
)
def rolling_7day_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames bound by VALUE distance, not row count — same-timestamp
    peers aggregate identically regardless of sort ties, which is what
    makes the result engine-deterministic. Both engines bound the frame at
    MICROSECOND precision (unix_micros / epoch_us): ordering by whole
    seconds would let sub-second timestamps shift frame membership between
    engines (ADVICE r1). One shuffle on user_id, one sort; the frame is a
    single-pass sliding aggregate, not a self-join."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-604_800_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.sum(F.col("value").cast(DEC6)).over(w).cast("double").alias("rolling_7d"),
    )


@register(
    "stream_sliding_window_agg",
    oracle="""
    WITH expanded AS (
        SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
                   AS ws,
               event_type, value
        FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
    doc="Sliding event-time windows (1 h wide, 30 min slide): every event "
    "lands in exactly two overlapping windows - the trend-smoothing shape "
    "tumbling windows can't express. Oracle expands each event to its two "
    "window starts.",
)
def stream_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same genuine streaming execution as stream_windowed_agg, with
    window(ts, '1 hour', '30 minutes'): Spark's stateful window operator
    assigns each row to width/slide windows via an internal expand -
    state is (windows x keys) bounded by the watermark horizon exactly
    like tumbling, just 2x the window cardinality."""
    from etl_loading_scripts_spark.catalog import _normalize_nanos, stream_source_schema

    src = table_path(sf_dir, "events")
    stream_dir = stream_source_dir(src, prefix="events_slide")

    raw_schema, nanos_cols = stream_source_schema(spark, src)
    stream = _normalize_nanos(
        spark.readStream.schema(raw_schema).parquet(stream_dir), nanos_cols
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("total_value"),
        )
    )
    sink = f"slide_out_{uuid.uuid4().hex[:8]}"
    # state-store partitions pinned to source volume (r15)
    with scoped_shuffle_partitions(spark, derived_state_partitions(spark, src)):
        q = agg.writeStream.outputMode("complete").format("memory").queryName(sink).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(sink).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "stream_static_enrich",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
    doc="Structured Streaming stream-static enrichment: the event stream "
    "joins the batch customer dimension (broadcast hash join inside each "
    "micro-batch) and aggregates per (market segment, event_type) — the "
    "canonical 'enrich clickstream with the user table' topology.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A stream-static join needs NO watermark and holds NO join state:
    every micro-batch hash-joins against the (re-read) static side, so
    dimension updates are picked up between batches — Spark's planner
    re-resolves the batch side per micro-batch. Broadcast keeps the
    stream side shuffle-free; the only stateful operator is the final
    aggregation, whose state is bounded by group cardinality
    (segments × event types), not stream length.

    At production scale the static side is a slowly-changing dim on
    object storage and the stream is Kafka; this plan is exactly what
    runs, sink swapped."""
    from etl_loading_scripts_spark.catalog import _normalize_nanos, stream_source_schema

    src = table_path(sf_dir, "events")
    stream_dir = stream_source_dir(src, prefix="events_sse")

    raw_schema, nanos_cols = stream_source_schema(spark, src)
    stream = _normalize_nanos(
        spark.readStream.schema(raw_schema).parquet(stream_dir), nanos_cols
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(F.broadcast(cust), "user_id")
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC6)).cast("double").alias("total_value"),
    )
    sink = f"stream_out_{uuid.uuid4().hex[:8]}"
    # state-store partitions pinned to source volume (r15)
    with scoped_shuffle_partitions(spark, derived_state_partitions(spark, src)):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(sink).select(
        "c_mktsegment", "event_type", "n_events", "total_value"
    )


#: Staleness bound for the tolerance as-of: matches older than this are
#: discarded (the attribution window).
ASOF_TOLERANCE_US = 7 * 24 * 3600 * 1_000_000  # 7 days


@register(
    "asof_join_tolerance",
    oracle=f"""
    WITH purchases AS (
        SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS ts_us,
               epoch_us(p.ts) AS raw_match_us
        FROM events e
        ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    )
    SELECT event_id, user_id, ts_us,
           CASE WHEN ts_us - raw_match_us <= {ASOF_TOLERANCE_US}
                THEN raw_match_us END AS last_purchase_us,
           CASE WHEN ts_us - raw_match_us <= {ASOF_TOLERANCE_US}
                THEN ts_us - raw_match_us END AS gap_us
    FROM matched
    """,
    doc="As-of join with a 7-day staleness tolerance: each event "
    "attributes to the user's most recent purchase at-or-before it ONLY "
    "if that purchase is within the window; older matches become NULL "
    "(no attribution) — the bounded-recall variant every attribution "
    "pipeline actually ships.",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same one-shuffle union + last_value(ignorenulls) plan as
    `asof_join_last_purchase`; the tolerance is a pure post-projection
    mask over the carried-forward timestamp, so bounding recall costs
    ZERO extra plan nodes beyond the CASE. (The naive tolerance
    formulation — a range join on [ts - 7d, ts] — explodes pairs before
    picking the max; here the window already picked it.) Microsecond
    arithmetic keeps the boundary exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.col("ts").alias("ref_ts"),
            F.lit(1).alias("is_ref"),
        )
    )
    probes = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("ref_ts"),
        F.lit(0).alias("is_ref"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_ref").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        probes.unionAll(purchases)
        .withColumn("carried_ref", F.last("ref_ts", ignorenulls=True).over(w))
        .filter(F.col("is_ref") == 0)
    )
    ts_us = F.unix_micros("ts")
    ref_us = F.unix_micros("carried_ref")
    in_window = (ts_us - ref_us) <= ASOF_TOLERANCE_US
    return carried.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        F.when(in_window, ref_us).alias("last_purchase_us"),
        F.when(in_window, ts_us - ref_us).alias("gap_us"),
    )


TOPK_WINDOWS = 3


@register(
    "stream_windowed_topk",
    oracle=f"""
    WITH agg AS (
        SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, total_value, rk
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY event_type
            ORDER BY total_value DESC, window_start
        ) AS INT) AS rk
        FROM agg
    ) WHERE rk <= {TOPK_WINDOWS}
    """,
    doc="Streaming top-k serving pattern: a REAL readStream drives the "
    "1-hour windowed aggregation into the sink; the top-3 busiest "
    "windows per event type are then ranked over the sink table — the "
    "'hot windows' leaderboard a monitoring dashboard reads.",
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda-free serving split: the UNBOUNDED computation (window
    sums, watermark-bounded state) runs in the stream; the per-query
    ranking runs over the sink's bounded result at read time. Ranking
    inside the stream would need complete-mode re-emission of every
    window per batch anyway — at the sink it's a |windows|-row window
    function, trivially cheap and always consistent with the latest
    micro-batch. State bound: watermark horizon × |event types|."""
    from etl_loading_scripts_spark.catalog import _normalize_nanos, stream_source_schema

    src = table_path(sf_dir, "events")
    stream_dir = stream_source_dir(src, prefix="events_twk")

    raw_schema, nanos_cols = stream_source_schema(spark, src)
    stream = _normalize_nanos(
        spark.readStream.schema(raw_schema).parquet(stream_dir), nanos_cols
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("total_value"),
        )
    )
    sink = f"stream_out_{uuid.uuid4().hex[:8]}"
    # state-store partitions pinned to source volume (r15)
    with scoped_shuffle_partitions(spark, derived_state_partitions(spark, src)):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    done = spark.table(sink).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), "window_start"
    )
    return (
        done.withColumn("rk", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rk") <= TOPK_WINDOWS)
    )
