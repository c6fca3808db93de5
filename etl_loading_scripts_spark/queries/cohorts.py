"""Cohort retention analysis over the event stream.

The canonical product-analytics rollup: assign every user to the ISO week
of their first event (the *cohort*), then count how many of each cohort
are still active N weeks later. The reference's month-window filters +
re-aggregation idiom (SURVEY §2.4, e.g. the HVD diner counts) is the same
two-level shape — this generalizes it to self-relative time.

Exactness: weeks are ``date_trunc('week', ts)`` (Monday-based in both
Spark and DuckDB), offsets are integer day-diffs divided by 7 (both
Monday-truncated, so always a whole multiple), and the retention ratio is
one double division of two exact integers — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register


@register(
    "cohort_retention",
    oracle="""
    WITH weeks AS (
        SELECT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk
        FROM events
        GROUP BY 1, 2
    ),
    cohort AS (
        SELECT user_id, min(wk) AS cohort_week FROM weeks GROUP BY 1
    ),
    ret AS (
        SELECT c.cohort_week,
               CAST(date_diff('day', CAST(c.cohort_week AS DATE),
                              CAST(w.wk AS DATE)) / 7 AS BIGINT)
                   AS week_offset,
               count(DISTINCT w.user_id) AS n_users
        FROM weeks w JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    ),
    base AS (
        SELECT cohort_week, n_users AS cohort_size FROM ret WHERE week_offset = 0
    )
    SELECT r.cohort_week, r.week_offset, r.n_users, b.cohort_size,
           CAST(r.n_users AS DOUBLE) / CAST(b.cohort_size AS DOUBLE)
               AS retention
    FROM ret r JOIN base b USING (cohort_week)
    """,
    doc="Weekly cohort retention matrix on events: users bucketed by "
    "first-active ISO week, distinct-active counts per (cohort, week "
    "offset), plus the retention ratio against the offset-0 cohort size.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the (user, week) dedup and the cohort min are two shuffles on
    user_id that AQE coalesces; the retention rollup groups on the tiny
    (cohort, offset) grain; the offset-0 base is a broadcast back-join.
    No window over global order, no collect — a year of events at 100 TB
    keeps the same three-stage shape, with the first shuffle pre-bucketed
    by user_id if the events table is written bucketed."""
    ev = load_table(spark, sf_dir, "events")
    weeks = (
        ev.select(
            "user_id",
            F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
                "wk"
            ),
        )
        .distinct()
    )
    cohort = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    ret = (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.col("wk").cast("date"), F.col("cohort_week").cast("date")
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    base = ret.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return ret.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        "cohort_size",
        (
            F.col("n_users").cast("double") / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )


@register(
    "event_transition_probs",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    trans AS (
        SELECT cur_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    totals AS (
        SELECT cur_type, CAST(SUM(n) AS BIGINT) AS n_cur FROM trans GROUP BY 1
    )
    SELECT t.cur_type, t.next_type, t.n,
           CAST(t.n AS DOUBLE) / tot.n_cur AS prob
    FROM trans t JOIN totals tot ON tot.cur_type = t.cur_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next event type | current), estimated from lead() "
    "pairs in strict (ts, event_id) order — the behavior model behind "
    "next-action prediction and funnel anomaly detection.",
)
def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on user_id for the sequence window (each
    user's history sorts independently), then a (cur, next) hash
    aggregate whose cardinality is |event types|² regardless of stream
    length; the denominator is a grain-to-grain re-agg of the SAME
    counts (never a second pass over events), and the probability is an
    exact integer ratio."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("cur_type").agg(F.sum("n").alias("n_cur"))
    return trans.join(F.broadcast(totals), "cur_type").select(
        "cur_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("n_cur")).alias("prob"),
    )


@register(
    "user_first_last_touch",
    oracle="""
    SELECT user_id,
           arg_min(event_type, printf('%020d|%020d', epoch_us(ts), event_id)) AS first_type,
           arg_max(event_type, printf('%020d|%020d', epoch_us(ts), event_id)) AS last_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
    doc="Per-user first- and last-touch event types via arg-extreme "
    "aggregates (min_by/max_by on the composite (ts, event_id) order) "
    "plus activity counts — both attribution endpoints in ONE aggregation "
    "pass, no window, no self-join.",
)
def user_first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-free attribution shape: ROW_NUMBER()-per-end needs two
    ordered windows (two sorts); min_by/max_by fold the argmin into the
    aggregate itself — one hash aggregate, map-side combinable, no sort
    at any scale. The zero-padded string key (fixed-width non-negative
    ints) makes composite-order ties deterministic in both engines
    without relying on struct-comparison support in the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    key = F.format_string("%020d|%020d", F.unix_micros("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_type"),
        F.max_by("event_type", key).alias("last_type"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


@register(
    "activity_heatmap_dow_hour",
    oracle="""
    SELECT CAST(dayofweek(ts) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Day-of-week × hour-of-day activity heatmap over events "
    "(0=Sunday convention on both engines after normalization) — the "
    "seasonality grid behind load forecasting and anomaly baselines.",
)
def activity_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: a two-key hash aggregate with ≤ 7×24 output cells — pure
    map-side combine, one tiny shuffle, no window. Date-part caveat
    handled explicitly: Spark's dayofweek() is 1-based (1=Sunday),
    DuckDB's dayofweek() is 0-based (0=Sunday); the Spark side subtracts
    1 so both report the 0=Sunday convention."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


@register(
    "event_gap_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
           quantile_cont(gap_us, 0.5) AS p50_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY 1
    """,
    doc="Inter-arrival gap distribution per event type: consecutive "
    "same-user same-type events' microsecond gaps summarized as "
    "count/min/max/exact-sum/median — the cadence profile behind "
    "session-timeout tuning and bot detection.",
)
def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one shuffle on (user_id, event_type) for the lag window —
    the narrowest partitioning that makes gaps well-defined — then a
    per-type aggregate of integer microsecond gaps (exact sum; mean =
    sum/n derivable downstream without float accumulation). The exact
    median sorts within type groups; at whale scale swap for
    percentile_approx as with the price profile twin. Feeds
    sessionize_events' gap threshold: pick it from this table's p50/max
    spread instead of folklore."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").alias("sum_gap_us"),
        F.expr("percentile(gap_us, 0.5)").alias("p50_gap_us"),
    )


@register(
    "cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY 1
    ),
    per_day AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_seen GROUP BY 1
    ),
    days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
    )
    SELECT CAST(strftime(dy.d, '%Y%m%d') AS INT) AS datekey,
           COALESCE(p.n_new, 0) AS n_new_users,
           CAST(SUM(COALESCE(p.n_new, 0)) OVER (
               ORDER BY dy.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM days dy LEFT JOIN per_day p ON p.d = dy.d
    """,
    doc="Cumulative distinct users by day WITHOUT a running "
    "COUNT(DISTINCT): each user collapses to their first-seen date, "
    "daily first-timer counts roll up, and a day-grain running sum "
    "reconstructs the exact cumulative-distinct curve — the growth "
    "chart every product dashboard shows.",
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite that makes cumulative-distinct tractable: a naive
    'COUNT(DISTINCT user) OVER (ORDER BY day)' needs every day to
    re-see all prior users (quadratic state, unsupported in Spark
    windows anyway). First-seen collapses the fact to |users| rows in
    one shuffle; everything after is day-grain (~10³ rows at any fact
    scale), where the ordered running sum is free. Same identity HLL
    sketches exploit for approximate curves; this is the exact form."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    per_day = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(per_day, "d", "left")
        .select("d", F.coalesce("n_new", F.lit(0)).alias("n_new_users"))
        .withColumn("cumulative_users", F.sum("n_new_users").over(w))
        .select(
            F.date_format("d", "yyyyMMdd").cast("int").alias("datekey"),
            "n_new_users",
            "cumulative_users",
        )
    )


@register(
    "daily_volume_anomalies",
    oracle="""
    WITH daily AS (
        SELECT CAST(strftime(CAST(ts AS DATE), '%Y%m%d') AS INT) AS datekey,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(n_events) AS BIGINT) AS s1,
               CAST(SUM(n_events * n_events) AS BIGINT) AS s2
        FROM daily
    )
    SELECT d.datekey, d.n_events,
           (d.n_events - CAST(m.s1 AS DOUBLE) / m.n_days)
               / sqrt(CAST(m.s2 AS DOUBLE) / m.n_days
                      - (CAST(m.s1 AS DOUBLE) / m.n_days)
                        * (CAST(m.s1 AS DOUBLE) / m.n_days)) AS zscore,
           CAST(abs(d.n_events - CAST(m.s1 AS DOUBLE) / m.n_days)
                > 2.0 * sqrt(CAST(m.s2 AS DOUBLE) / m.n_days
                             - (CAST(m.s1 AS DOUBLE) / m.n_days)
                               * (CAST(m.s1 AS DOUBLE) / m.n_days))
                AS BIGINT) AS is_anomaly
    FROM daily d CROSS JOIN m
    """,
    doc="Day-level volume anomaly report: every day's event count "
    "z-scored against the whole period's mean/std (exact integer "
    "moments → identical doubles in both engines), flagged beyond 2σ — "
    "the pipeline-health alarm row.",
)
def daily_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the fact collapses to day grain in one map-side-combinable
    aggregate (~10³ rows for years of data); moments are a single-row
    re-agg of THOSE rows broadcast back — the fact is scanned once and
    never joined to itself. Population σ from exact int64 moments keeps
    the 2σ boundary decision bit-stable across engines; swap in a
    rolling window mean (gap_fill machinery) when the series trends."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyyMMdd").cast("int").alias("datekey")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    m = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    std = F.sqrt(F.col("s2").cast("double") / F.col("n_days") - mean * mean)
    return daily.crossJoin(F.broadcast(m)).select(
        "datekey",
        "n_events",
        ((F.col("n_events") - mean) / std).alias("zscore"),
        (F.abs(F.col("n_events") - mean) > 2.0 * std).cast("long").alias("is_anomaly"),
    )


@register(
    "ab_test_conversion_analysis",
    oracle="""
    WITH views AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    conv AS (
        SELECT v.user_id,
               CAST(MAX(CASE WHEN p.ts > v.first_view THEN 1 ELSE 0 END)
                    AS BIGINT) AS converted
        FROM views v
        LEFT JOIN events p
          ON p.user_id = v.user_id AND p.event_type = 'purchase'
        GROUP BY 1, v.first_view
    )
    SELECT CAST(user_id % 2 AS INT) AS arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conv_rate
    FROM conv GROUP BY 1
    """,
    doc="A/B conversion readout: users deterministically split into two "
    "arms (user_id parity — the hash-bucket assignment every experiment "
    "platform uses), conversion = a purchase strictly after the user's "
    "first view; per arm: exposed users, converters, conversion rate "
    "(single exact division). The two-proportion test statistic is "
    "computable from these four integers per arm — the analysis every "
    "growth team runs daily.",
)
def ab_test_conversion_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape: one aggregate to first-view per user, one semi-ish left
    join against purchases, one bounded per-arm rollup — fact-scale work
    is two shuffles on user_id and nothing driver-side. Assignment by
    key arithmetic (not RNG) is what makes the experiment re-analyzable:
    any engine reproduces the same arms from the same ids."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        views.join(purchases, "user_id", "left")
        .groupBy("user_id", "first_view")
        .agg(
            F.max(
                F.when(F.col("p_ts") > F.col("first_view"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("converted")
        )
    )
    return conv.groupBy(
        (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("conv_rate"),
    )


@register(
    "ab_cuped_moments",
    oracle="""
    WITH views AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    pre AS (
        SELECT v.user_id, v.first_view,
               CAST(COUNT(c.event_id) AS BIGINT) AS pre_clicks
        FROM views v
        LEFT JOIN events c
          ON c.user_id = v.user_id AND c.event_type = 'click'
         AND c.ts < v.first_view
        GROUP BY 1, 2
    ),
    conv AS (
        SELECT p.user_id, p.pre_clicks,
               CAST(MAX(CASE WHEN e.ts > p.first_view THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM pre p
        LEFT JOIN events e
          ON e.user_id = p.user_id AND e.event_type = 'purchase'
        GROUP BY 1, 2, p.first_view
    )
    SELECT CAST(user_id % 2 AS INT) AS arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pre_clicks) AS BIGINT) AS sum_x,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           CAST(SUM(pre_clicks * y) AS BIGINT) AS sum_xy,
           CAST(SUM(pre_clicks * pre_clicks) AS BIGINT) AS sum_x2
    FROM conv GROUP BY 1
    """,
    doc="CUPED variance-reduction inputs for the A/B readout: per arm, "
    "the exact integer moments (n, Σx, Σy, Σxy, Σx²) of pre-exposure "
    "click count x against conversion y — θ = cov(x,y)/var(x) and the "
    "adjusted means fall out arithmetically. Publishing the MOMENTS "
    "instead of θ keeps the result bit-stable (a float covariance sum "
    "is addition-order-dependent; integer moments are not) — the same "
    "discipline as the chi-square cells and TVD parts.",
)
def ab_cuped_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-exposure covariates are the only legitimate ones (anything
    post-assignment is collider bias), hence the strict ts < first_view
    guard. Shape: three user-grain aggregates/joins on user_id, one
    bounded per-arm rollup — CUPED costs one extra pass over the events
    the experiment already scans."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    pre = (
        views.join(clicks, "user_id", "left")
        .groupBy("user_id", "first_view")
        .agg(
            F.sum(
                F.when(F.col("c_ts") < F.col("first_view"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("pre_clicks")
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        pre.join(purchases, "user_id", "left")
        .groupBy("user_id", "first_view", "pre_clicks")
        .agg(
            F.max(F.when(F.col("p_ts") > F.col("first_view"), 1).otherwise(0))
            .cast("bigint")
            .alias("y")
        )
    )
    return conv.groupBy((F.col("user_id") % 2).cast("int").alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre_clicks").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.sum(F.col("pre_clicks") * F.col("y")).cast("bigint").alias("sum_xy"),
        F.sum(F.col("pre_clicks") * F.col("pre_clicks"))
        .cast("bigint")
        .alias("sum_x2"),
    )


@register(
    "ab_sample_ratio_mismatch",
    oracle="""
    WITH views AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    ),
    arms AS (
        SELECT CAST(user_id % 2 AS INT) AS arm,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM views GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n FROM arms)
    SELECT a.arm, a.n_users, t.n AS n_total,
           POWER(CAST(2 * a.n_users - t.n AS DOUBLE), 2)
               / (2.0 * t.n) AS chi2_cell
    FROM arms a CROSS JOIN tot t
    """,
    doc="Sample-ratio-mismatch check for the 50/50 experiment split: per "
    "arm, observed exposed users against the total, with the chi-square "
    "cell (obs−exp)²/exp in the integer-numerator form "
    "(2·n_arm − n_total)²/(2·n_total) — the guardrail read BEFORE any "
    "conversion number, since a split that isn't 50/50 means the "
    "assignment or logging is broken and the readout is invalid.",
)
def ab_sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distinct-users pass, a two-row aggregate, a single-row total
    broadcast. The statistic's inputs stay integers until one final
    division per arm — the chi2_independence_cells discipline; the
    p-value lookup (df=1) happens wherever the report renders."""
    ev = load_table(spark, sf_dir, "events")
    exposed = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    arms = exposed.groupBy(
        (F.col("user_id") % 2).cast("int").alias("arm")
    ).agg(F.count(F.lit(1)).alias("n_users"))
    tot = arms.agg(F.sum("n_users").cast("bigint").alias("n_total"))
    return arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n_users",
        "n_total",
        (
            F.pow((2 * F.col("n_users") - F.col("n_total")).cast("double"), F.lit(2))
            / (2.0 * F.col("n_total"))
        ).alias("chi2_cell"),
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               MIN((CAST(strftime(o_orderdate, '%Y') AS INT)) * 12
                   + CAST(strftime(o_orderdate, '%m') AS INT) - 1) AS c0
        FROM orders GROUP BY 1
    ),
    rev AS (
        SELECT f.c0 AS cohort_ix,
               (CAST(strftime(o.o_orderdate, '%Y') AS INT)) * 12
                   + CAST(strftime(o.o_orderdate, '%m') AS INT) - 1 - f.c0
                   AS age_months,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    grains AS (
        SELECT cohort_ix, age_months,
               CAST(SUM(cents) AS BIGINT) AS month_cents
        FROM rev WHERE age_months <= 11 GROUP BY 1, 2
    )
    SELECT CAST((cohort_ix // 12) * 100 + (cohort_ix % 12) + 1 AS INT)
               AS cohort_month,
           CAST(age_months AS INT) AS age_months,
           month_cents,
           CAST(SUM(month_cents) OVER (
               PARTITION BY cohort_ix ORDER BY age_months
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cumulative_cents
    FROM grains
    """,
    doc="Cohort LTV curve: customers grouped by acquisition month, "
    "revenue accumulated over the first 12 months of cohort age in "
    "exact cents — month-index arithmetic (year·12+month) makes age "
    "subtraction year-boundary-safe, and the running sum is a "
    "cohort-partitioned window over ≤12 bounded grains per cohort. The "
    "payback-period read under every acquisition-spend decision.",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as _W

    orders = load_table(spark, sf_dir, "orders")
    mix = F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    firsts = orders.groupBy("o_custkey").agg(F.min(mix).alias("c0"))
    rev = orders.join(firsts, "o_custkey").select(
        F.col("c0").alias("cohort_ix"),
        (mix - F.col("c0")).alias("age_months"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    grains = (
        rev.filter(F.col("age_months") <= 11)
        .groupBy("cohort_ix", "age_months")
        .agg(F.sum("cents").cast("bigint").alias("month_cents"))
    )
    w = (
        _W.partitionBy("cohort_ix")
        .orderBy("age_months")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    return grains.select(
        F.expr("cast((cohort_ix div 12) * 100 + (cohort_ix % 12) + 1 as int)")
        .alias("cohort_month"),
        F.col("age_months").cast("int").alias("age_months"),
        "month_cents",
        F.sum("month_cents").over(w).cast("bigint").alias("cumulative_cents"),
    )


@register(
    "event_trigram_paths",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER w AS prev1,
               lag(event_type, 2) OVER w AS prev2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev2 AS step1, prev1 AS step2, event_type AS step3,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM ordered
    WHERE prev2 IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    doc="Behavioral trigram mining: every three-step event path per user "
    "(time-ordered, unique tie-break) counted across the corpus — the "
    "journey-discovery input behind funnel design, one step deeper than "
    "event_transition_probs' bigrams; the |types|³-bounded output is "
    "the empirical third-order Markov table.",
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two lags over one user-partitioned window (shared window spec, one
    shuffle), then a bounded aggregate — path mining at any corpus scale
    costs the sessionize shuffle and nothing more."""
    from pyspark.sql.window import Window as _W

    ev = load_table(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        F.lag("event_type", 2).over(w).alias("step1"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.col("event_type").alias("step3"),
    )
    return (
        ordered.filter(F.col("step1").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
