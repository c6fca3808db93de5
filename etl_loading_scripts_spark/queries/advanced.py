"""Advanced relational operators: skyline (Pareto frontier) and
interval-overlap (range) joins — two classics Spark has no native
operator for, each written as a scale-safe DataFrame composition.

- ``skyline_pareto`` — the set of parts not dominated on
  (minimize retailprice, maximize size). The textbook definition is an
  all-pairs NOT EXISTS (the DuckDB oracle runs exactly that); the engine
  plan is the banded prefix-max decomposition that stays shuffle-bounded
  at any scale.
- ``interval_overlap_join`` — probes joined to time intervals they fall
  in. Spark has no range-join operator; the engine plan is the
  time-grid bucketing rewrite (the same trick Databricks' range-join
  hint applies internally): explode each interval onto the hour grid it
  covers, hash-join probes on their hour bucket, then apply the exact
  range predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

#: Price-band width for the skyline's banded prefix max. Bands only need
#: to be "few per executor-sized chunk of the domain": the cross-band
#: rollup is |domain|/width rows, the within-band window partitions on
#: the band key. 10 currency units → ~10 bands on the synthetic domain.
SKYLINE_BAND = 10

#: Interval-join grid: one bucket per hour, matching the 1h window width
#: so every interval covers ≤ 2 buckets.
GRID_SEC = 3600
WINDOW_SEC = 3600


@register(
    "skyline_pareto",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    doc="Skyline / Pareto frontier of parts under (min retailprice, max "
    "size): every part not strictly dominated. Oracle is the O(n²) "
    "NOT-EXISTS definition; the engine runs the banded prefix-max plan.",
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the 2-D skyline needs, for each point, (a) the max size at
    strictly lower prices and (b) the max size at its own price. Both
    reduce to one groupBy(price) [shuffle 1, map-side combined], a
    banded cumulative max — window partitioned by price band + a
    band-level rollup small enough to window globally (|domain|/width
    rows, NOT data-sized) — and one broadcast-back join [no extra
    shuffle]. No all-pairs join anywhere; a 10-billion-part catalog
    keeps the same three stages. Survivors: size == own-price max AND
    size > every strictly-lower-price max."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    price_max = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("pmax")
    ).withColumn("band", F.floor(F.col("p_retailprice") / SKYLINE_BAND))
    # Within-band strict-prefix max over distinct prices.
    w_in = (
        Window.partitionBy("band")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Cross-band prefix: per-band maxes, cumulatively maxed over the tiny
    # band table (global window over |bands| rows, not data rows).
    band_max = price_max.groupBy("band").agg(F.max("pmax").alias("bmax"))
    w_band = (
        Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    )
    band_prefix = band_max.select(
        "band", F.max("bmax").over(w_band).alias("prev_band_max")
    )
    levels = (
        price_max.withColumn("in_band_prefix", F.max("pmax").over(w_in))
        .join(F.broadcast(band_prefix), "band")
        .select(
            "p_retailprice",
            "pmax",
            F.greatest(
                F.coalesce(F.col("in_band_prefix"), F.lit(-1)),
                F.coalesce(F.col("prev_band_max"), F.lit(-1)),
            ).alias("strict_prefix_max"),
        )
    )
    return (
        part.join(F.broadcast(levels), "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("pmax"))
            & (F.col("p_size") > F.col("strict_prefix_max"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


@register(
    "interval_overlap_join",
    oracle=f"""
    WITH iv AS (
        SELECT event_id AS window_id, ts AS lo,
               ts + INTERVAL {WINDOW_SEC} SECOND AS hi
        FROM events WHERE event_type = 'signup'
    ),
    pur AS (
        SELECT event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    )
    SELECT i.window_id,
           count(p.event_id) AS n_purchases,
           CAST(COALESCE(sum(p.cents), 0) AS BIGINT) AS value_cents
    FROM iv i LEFT JOIN pur p ON p.ts >= i.lo AND p.ts < i.hi
    GROUP BY 1
    """,
    doc=f"Interval-overlap join: every signup opens a {WINDOW_SEC}-second "
    "window; purchases (any user) falling inside are counted and summed "
    "(integer cents). Engine plan: hour-grid bucketing rewrite of the "
    "range join; oracle: the naive theta join.",
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: a theta range-join is a cartesian disaster; the grid
    rewrite makes it a hash join. Each interval explodes onto the ≤ 2
    hour buckets it covers; each probe carries its single bucket; the
    equi-join on bucket bounds candidates to intervals *near in time*,
    and the exact predicate filters inside the bucket. Grid width tracks
    window width so blow-up stays ≤ 2×. One hash-join shuffle + one
    groupBy(window_id); empty windows come back via a key-equi left join
    of the matched counts onto the interval set (never a row-preserving
    outer theta join). Bucketing uses second-truncated epochs (safe: floor is
    monotone), the predicate the exact timestamps."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr(f"INTERVAL {WINDOW_SEC} SECOND")).alias("hi"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("probe_id"),
        F.col("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.unix_timestamp("ts") / GRID_SEC).cast("long").alias("bucket"),
    )
    iv_g = iv.select(
        "window_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                (F.unix_timestamp("lo") / GRID_SEC).cast("long"),
                (F.unix_timestamp("hi") / GRID_SEC).cast("long"),
            )
        ).alias("bucket"),
    )
    matched = (
        iv_g.join(pur, "bucket")
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("value_cents"),
        )
    )
    return iv.select("window_id").join(matched, "window_id", "left").select(
        "window_id",
        F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        F.coalesce(F.col("value_cents"), F.lit(0)).alias("value_cents"),
    )


#: Interval length for the concurrency sweep: every event holds a resource
#: (session/connection/license) open this long.
SWEEP_SESSION_US = 1_800 * 1_000_000  # 30 min in microseconds


@register(
    "max_concurrent_intervals",
    oracle=f"""
    WITH deltas AS (
        SELECT event_type, epoch_us(ts) AS t, 1 AS d FROM events
        UNION ALL
        SELECT event_type, epoch_us(ts) + {SWEEP_SESSION_US}, -1 FROM events
    ),
    series AS (
        SELECT event_type, t, SUM(d) AS d FROM deltas GROUP BY 1, 2
    ),
    running AS (
        SELECT event_type, t,
               SUM(d) OVER (
                   PARTITION BY event_type ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS open_count
        FROM series
    ),
    peak AS (
        SELECT event_type, MAX(open_count) AS max_concurrent
        FROM running GROUP BY 1
    )
    SELECT r.event_type,
           CAST(p.max_concurrent AS BIGINT) AS max_concurrent,
           MIN(r.t) AS first_peak_us
    FROM running r
    JOIN peak p ON r.event_type = p.event_type
               AND r.open_count = p.max_concurrent
    GROUP BY 1, 2
    """,
    doc="Sweep-line concurrency: every event opens a 30-minute interval; "
    "per event_type, the maximum number of simultaneously-open intervals "
    "and the first instant it is reached. The classic 'peak concurrent "
    "sessions' metric, computed WITHOUT an interval self-join: intervals "
    "become +1/-1 boundary deltas, a running sum counts what's open.",
)
def max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the naive formulation self-joins intervals on overlap —
    quadratic in the dense regions where the answer lives. The sweep is
    linear: (1) each interval emits two (t, ±1) deltas in the scan stage;
    (2) deltas are hash-aggregated per (key, t) — map-side combine
    collapses the raw event volume to the distinct-timestamp volume
    BEFORE any sort; (3) one ordered window per key runs the cumulative
    sum. Net-summing simultaneous deltas (end −1 merged with start +1 at
    the same instant) bakes in half-open [s, e) semantics: touching
    intervals never count as concurrent, in either engine.

    The per-key ordered window sorts within a shuffle partition; at a
    scale where a single key's distinct timestamps exceed one task, use
    the two-phase form: cumulative-sum within coarse time chunks, then
    add per-chunk offsets (chunk totals are tiny — same offset trick as
    ``surrogate_key_allocation_partitioned``, operators/mutations.py).

    Microsecond epochs on both engines (``unix_micros`` / ``epoch_us``)
    keep frame boundaries exact for sub-second timestamps."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("st")
    )
    starts = ev.select("event_type", F.col("st").alias("t"), F.lit(1).alias("d"))
    ends = ev.select(
        "event_type", (F.col("st") + SWEEP_SESSION_US).alias("t"), F.lit(-1).alias("d")
    )
    series = starts.unionAll(ends).groupBy("event_type", "t").agg(F.sum("d").alias("d"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = series.withColumn("open_count", F.sum("d").over(w))
    peak = running.groupBy("event_type").agg(
        F.max("open_count").alias("max_concurrent")
    )
    return (
        running.join(F.broadcast(peak), "event_type")
        .filter(F.col("open_count") == F.col("max_concurrent"))
        .groupBy("event_type", "max_concurrent")
        .agg(F.min("t").alias("first_peak_us"))
        .select(
            "event_type",
            F.col("max_concurrent").cast("long").alias("max_concurrent"),
            "first_peak_us",
        )
    )


#: Benford expected first-digit frequencies, permille, as exact literals
#: (floor(log10(1+1/d) * 1000)) so both engines share the same table.
BENFORD_PERMILLE = [
    (1, 301), (2, 176), (3, 124), (4, 96), (5, 79),
    (6, 66), (7, 57), (8, 51), (9, 45),
]

_BENFORD_VALUES = ", ".join(f"({d}, {p})" for d, p in BENFORD_PERMILLE)


@register(
    "abc_pareto_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem
        GROUP BY 1
    ),
    cum AS (
        SELECT l_partkey, cents,
               SUM(cents) OVER (
                   ORDER BY cents DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_cents,
               SUM(cents) OVER () AS total_cents
        FROM rev
    )
    SELECT CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 'A'
                WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents,
           CAST(MIN(total_cents) AS BIGINT) AS total_cents
    FROM cum
    GROUP BY 1
    ORDER BY 1
    """,
    doc="ABC (Pareto 80/15/5) inventory classification of parts by "
    "revenue: rank parts by descending revenue, classify by exact "
    "integer cumulative-share compares (cum*5 <= total*4 is the 80% "
    "boundary — no float shares), and roll up count + revenue per "
    "class. The running total is the scale-safe range-bucket cumsum, "
    "not a single-partition window.",
)
def abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the global descending cumulative sum uses
    ``operators/ranks.global_cumsum`` — range-repartition on the sort
    key, per-partition sum offsets folded driver-side (bytes, not
    data), bucket-local window — so the plan has no
    ``Exchange SinglePartition`` even at a billion parts. The grand
    total rides along as a single-row broadcast. All money math is
    integer cents; the class boundaries are integer cross-multiplies,
    so the A/B/C membership of every boundary part is engine-exact."""
    from etl_loading_scripts_spark.operators.ranks import global_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
        .withColumn("neg_cents", -F.col("cents"))
    )
    cum = global_cumsum(
        rev, ["neg_cents", "l_partkey"], "cents", cum_col="cum_cents"
    )
    total = cum.agg(F.sum("cents").cast("long").alias("total_cents"))
    cls = (
        F.when(F.col("cum_cents") * 5 <= F.col("total_cents") * 4, "A")
        .when(F.col("cum_cents") * 20 <= F.col("total_cents") * 19, "B")
        .otherwise("C")
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .select(cls.alias("abc_class"), "cents", "total_cents")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").cast("long").alias("class_cents"),
            F.min("total_cents").cast("long").alias("total_cents"),
        )
        .orderBy("abc_class")
    )


@register(
    "user_longest_daily_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    seq AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', day) AS day_int,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM days
    ),
    islands AS (
        SELECT user_id, day_int - rn AS grp, CAST(COUNT(*) AS BIGINT) AS len
        FROM seq
        GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Longest consecutive-day activity streak per user via the "
    "gaps-and-islands idiom: distinct active days, day-number minus "
    "per-user row_number as the island key, then per-island lengths "
    "rolled up to (longest streak, active days, streak count).",
)
def user_longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the row_number window partitions on user_id — bounded by
    one user's active days (≤ a few thousand rows even over a decade),
    never fact grain — and everything after is hash aggregates with
    map-side combine. One shuffle on user_id serves the window and both
    aggregates. The island key ``day_int - rn`` is pure integer
    arithmetic, so island membership is engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    seq = days.select(
        "user_id",
        F.datediff(F.col("day"), F.lit("2024-01-01")).alias("day_int"),
        F.row_number().over(w).alias("rn"),
    )
    islands = (
        seq.select("user_id", (F.col("day_int") - F.col("rn")).alias("grp"))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak"),
            F.sum("len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


@register(
    "spend_concentration_gini",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        GROUP BY 1
    ),
    ranked AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rn
        FROM spend
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(2 * SUM(rn * cents) - (COUNT(*) + 1) * SUM(cents) AS BIGINT)
               AS gini_num,
           CAST(COUNT(*) * SUM(cents) AS BIGINT) AS gini_den
    FROM ranked
    """,
    doc="Economy-wide spend concentration: the exact Gini coefficient "
    "of per-customer order spend from the closed-form rank formula "
    "G = (2*sum(i*s_i) - (n+1)*sum(s_i)) / (n*sum(s_i)) over ascending "
    "spend — returned as an integer numerator/denominator pair. The "
    "Lorenz-curve inequality measure a marketplace health dashboard "
    "tracks, bit-exact across engines.",
)
def spend_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the global ascending rank is
    ``operators/ranks.global_row_number`` (range buckets, no
    single-partition sort); the Gini formula then needs only one hash
    aggregate of (count, sum(cents), sum(rank*cents)). Nothing beyond
    ~32 boundary literals ever reaches the driver. sum(rn*cents) fits
    int64 up to ~10^9 customers x 10^5-cent spends scaled; past that,
    promote to decimal(38,0) in the same expression."""
    from etl_loading_scripts_spark.operators.ranks import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    ranked = global_row_number(spend, ["cents", "o_custkey"], rank_col="rn")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        (
            2 * F.sum(F.col("rn") * F.col("cents"))
            - (F.count(F.lit(1)) + 1) * F.sum("cents")
        )
        .cast("long")
        .alias("gini_num"),
        (F.count(F.lit(1)) * F.sum("cents")).cast("long").alias("gini_den"),
    )


@register(
    "benford_first_digit",
    oracle=f"""
    WITH expected(digit, expected_permille) AS (VALUES {_BENFORD_VALUES}),
    digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM digits)
    SELECT d.digit,
           d.n_orders,
           CAST(d.n_orders * 1000 // t.total AS BIGINT) AS observed_permille,
           CAST(e.expected_permille AS BIGINT) AS expected_permille
    FROM digits d
    JOIN expected e ON d.digit = e.digit
    CROSS JOIN tot t
    ORDER BY d.digit
    """,
    doc="Benford's-law first-digit audit of order totals: observed "
    "first-digit counts vs the expected log10(1+1/d) distribution, "
    "both as exact integer permille (floor division — no float "
    "frequencies). The fraud / synthetic-data smoke test a data-quality "
    "suite runs over money columns.",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one hash aggregate from fact grain to at most 9 digit
    rows, then a broadcast join to the 9-row expected table and a
    single-row total broadcast. The digit extraction
    (floor → bigint → leading decimal char) is pure JVM expression
    work inside whole-stage codegen."""
    orders = load_table(spark, sf_dir, "orders")
    digits = (
        orders.select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    expected = spark.createDataFrame(
        BENFORD_PERMILLE, "digit int, expected_permille long"
    )
    tot = digits.agg(F.sum("n_orders").cast("long").alias("total"))
    return (
        digits.join(F.broadcast(expected), "digit")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            F.expr("n_orders * 1000 div total").cast("long").alias(
                "observed_permille"
            ),
            "expected_permille",
        )
        .orderBy("digit")
    )


@register(
    "chi2_independence_cells",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS priority, o_orderstatus AS status,
               CAST(COUNT(*) AS BIGINT) AS obs
        FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT priority, CAST(SUM(obs) AS BIGINT) AS row_total FROM cells GROUP BY 1),
    ct AS (SELECT status, CAST(SUM(obs) AS BIGINT) AS col_total FROM cells GROUP BY 1),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
    SELECT c.priority, c.status, c.obs,
           rt.row_total, ct.col_total,
           POWER(CAST(n.n * c.obs - rt.row_total * ct.col_total AS DOUBLE), 2)
               / (CAST(n.n AS DOUBLE) * rt.row_total * ct.col_total)
               AS chi2_cell
    FROM cells c
    JOIN rt ON c.priority = rt.priority
    JOIN ct ON c.status = ct.status
    CROSS JOIN n
    """,
    doc="Chi-square test of independence between order priority and order "
    "status: the full contingency table with per-cell chi-square "
    "contributions — (N*obs - rowTotal*colTotal)^2 / (N*rowTotal*colTotal), "
    "the N-scaled form whose inputs stay exact integers so the single "
    "float division is bit-identical across engines. The statistic is the "
    "cell sum; it is NOT summed here because a float sum's value depends "
    "on addition order (registry determinism rule #2).",
)
def chi2_independence_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependence screening between categorical columns is a routine
    feature-audit step (leakage detection, stratification checks). Shape:
    one hash aggregate for the cells, two broadcast-joined marginal
    rollups, one broadcast scalar N — a plan whose only full-data pass is
    the first groupBy, so it runs at fact scale unchanged. The per-cell
    output also IS the diagnostic: the analyst reads which cells carry
    the dependence, which a single scalar statistic hides."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("obs"))
    rt = cells.groupBy("priority").agg(F.sum("obs").alias("row_total"))
    ct = cells.groupBy("status").agg(F.sum("obs").alias("col_total"))
    n = cells.agg(F.sum("obs").alias("n"))
    num = (F.col("n") * F.col("obs") - F.col("row_total") * F.col("col_total")).cast(
        "double"
    )
    return (
        cells.join(F.broadcast(rt), "priority")
        .join(F.broadcast(ct), "status")
        .crossJoin(F.broadcast(n))
        .select(
            "priority",
            "status",
            "obs",
            "row_total",
            "col_total",
            (
                F.pow(num, F.lit(2))
                / (
                    F.col("n").cast("double")
                    * F.col("row_total")
                    * F.col("col_total")
                )
            ).alias("chi2_cell"),
        )
    )


# ---------------------------------------------------------------------------
# Distribution drift between two periods — exact total-variation parts
# ---------------------------------------------------------------------------

DRIFT_BAND = 50000  # price-band width (cents-free: o_totalprice units)


@register(
    "drift_price_bands_tvd",
    oracle=f"""
    WITH mm AS (
        SELECT CAST(strftime(MIN(o_orderdate), '%Y') AS INT) AS y0,
               CAST(strftime(MAX(o_orderdate), '%Y') AS INT) AS y1
        FROM orders
    ),
    tagged AS (
        SELECT CAST(FLOOR(o_totalprice / {DRIFT_BAND}) AS INT) AS band,
               CASE WHEN CAST(strftime(o_orderdate, '%Y') AS INT) = mm.y0
                    THEN 'a' ELSE 'b' END AS period
        FROM orders, mm
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) IN (mm.y0, mm.y1)
    ),
    cells AS (
        SELECT band,
               CAST(SUM(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM tagged GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM cells)
    SELECT c.band, c.ca, c.cb,
           CAST(abs(c.ca * t.nb - c.cb * t.na) AS BIGINT) AS tvd_numerator,
           CAST(t.na * t.nb AS BIGINT) AS tvd_denominator
    FROM cells c CROSS JOIN tot t
    """,
    doc=f"Distribution drift of order totals between the first and last "
    f"calendar year, in {DRIFT_BAND}-wide bands: per-band counts plus the "
    "exact integer parts of the total-variation distance — "
    "|ca·nb − cb·na| over na·nb, so TVD = Σ numerator / (2·denominator) "
    "with no order-dependent float sum anywhere. The drift report run "
    "before trusting a model trained on last period's distribution.",
)
def drift_price_bands_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why TVD over PSI/KL here: those need ln(pa/pb), which is both
    undefined on empty cells and float-transcendental (never bit-stable
    across engines); TVD is a rational of counts — exact, defined
    everywhere, and bounded [0,1]. Shape: one fact pass to band+period
    cells, one bounded cell aggregate, a single-row totals broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    years = orders.agg(
        F.min(F.year("o_orderdate")).alias("y0"),
        F.max(F.year("o_orderdate")).alias("y1"),
    ).first()
    tagged = (
        orders.filter(F.year("o_orderdate").isin(years["y0"], years["y1"]))
        .select(
            F.floor(F.col("o_totalprice") / DRIFT_BAND).cast("int").alias("band"),
            F.when(F.year("o_orderdate") == years["y0"], "a")
            .otherwise("b")
            .alias("period"),
        )
    )
    cells = tagged.groupBy("band").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    tot = cells.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "band",
        "ca",
        "cb",
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
        .cast("bigint")
        .alias("tvd_numerator"),
        (F.col("na") * F.col("nb")).cast("bigint").alias("tvd_denominator"),
    )


# ---------------------------------------------------------------------------
# Missing-value imputation with exact group medians
# ---------------------------------------------------------------------------

IMPUTE_MISS_MOD = 11  # every 11th customer's balance plays 'missing'


@register(
    "impute_median_by_group",
    oracle=f"""
    WITH flagged AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey % {IMPUTE_MISS_MOD} = 0 THEN NULL
                    ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS bal_cents
        FROM customer
    ),
    med AS (
        SELECT c_nationkey,
               CAST(median(bal_cents) AS DOUBLE) AS med_cents
        FROM flagged WHERE bal_cents IS NOT NULL GROUP BY 1
    )
    SELECT f.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN f.bal_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_imputed,
           m.med_cents AS imputed_cents,
           CAST(SUM(COALESCE(CAST(f.bal_cents AS DOUBLE), m.med_cents)) AS DOUBLE)
               / 100.0 AS total_after
    FROM flagged f JOIN med m ON f.c_nationkey = m.c_nationkey
    GROUP BY 1, m.med_cents
    """,
    doc=f"Exact per-group median imputation: every {IMPUTE_MISS_MOD}th "
    "customer's balance plays missing and is filled with its nation's "
    "exact median of the observed values (integer cents; even-count "
    "medians are the midpoint of the two central values, identical in "
    "both engines) — the feature-pipeline fill that approx-percentile "
    "imputation silently randomizes.",
)
def impute_median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sum-after check is what makes this a correctness operator:
    imputing with a wrong median (approx sketch, off-by-one midpoint,
    NULLs inside the median) shifts total_after. Exact median per group
    via percentile(0.5) over integer cents — a sort-based aggregate
    within each group, no global sort; the float sum at the end is over
    values each exactly representable (cents and cent-midpoints), with
    DECIMAL-free midpoint halves still exact in binary (x.5)."""
    cust = load_table(spark, sf_dir, "customer")
    flagged = cust.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % IMPUTE_MISS_MOD == 0, F.lit(None))
        .otherwise(F.round(F.col("c_acctbal") * 100).cast("bigint"))
        .alias("bal_cents"),
    )
    med = (
        flagged.filter(F.col("bal_cents").isNotNull())
        .groupBy("c_nationkey")
        .agg(
            F.expr("percentile(bal_cents, 0.5)").alias("med_cents")
        )
    )
    return (
        flagged.join(F.broadcast(med), "c_nationkey")
        .groupBy(F.col("c_nationkey").alias("nationkey"), F.col("med_cents"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("bal_cents").isNull().cast("int"))
            .cast("bigint")
            .alias("n_imputed"),
            (
                F.sum(
                    F.coalesce(
                        F.col("bal_cents").cast("double"), F.col("med_cents")
                    )
                )
                / 100.0
            ).alias("total_after"),
        )
        .select(
            "nationkey",
            "n_customers",
            "n_imputed",
            F.col("med_cents").alias("imputed_cents"),
            "total_after",
        )
    )


# ---------------------------------------------------------------------------
# Feature hashing — the dimensionality trick and its collision audit
# ---------------------------------------------------------------------------

HASH_DIM = 32  # feature-hash bucket count


@register(
    "feature_hash_collisions",
    oracle=f"""
    WITH cats AS (
        SELECT DISTINCT p_type || '|' || p_name AS category FROM part
    ),
    bucketed AS (
        SELECT category,
               CAST(
                   (CAST(('0x' || substr(md5(category), 1, 8)) AS BIGINT)
                    % {HASH_DIM} + {HASH_DIM}) % {HASH_DIM}
               AS INT) AS bucket
        FROM cats
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_categories,
           MIN(category) AS example_category,
           COUNT(*) > 1 AS has_collision
    FROM bucketed GROUP BY 1
    """,
    doc=f"Feature-hashing collision audit: every (type, name) category hashed into "
    f"{HASH_DIM} buckets via the first 8 md5 hex digits — per-bucket "
    "category counts with a collision flag. The report that sizes the "
    "hash dimension before the encoder ships: buckets with "
    "n_categories > 1 alias their features.",
)
def feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick encoder needs no vocabulary shuffle — category →
    bucket is a map-side expression, which is the whole point at 100 TB
    (a learned vocabulary is a full groupBy + broadcast round-trip).
    Its price is collisions, and this audit prices them exactly. The
    md5-prefix-mod bucket is engine-portable (both engines parse the hex
    prefix as the same integer; the double-mod keeps negatives out)."""
    part = load_table(spark, sf_dir, "part")
    cats = part.select(
        F.concat_ws("|", "p_type", "p_name").alias("category")
    ).distinct()
    bucket = (
        (
            F.conv(F.substring(F.md5("category"), 1, 8), 16, 10).cast("bigint")
            % HASH_DIM
            + HASH_DIM
        )
        % HASH_DIM
    ).cast("int")
    return (
        cats.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_categories"),
            F.min("category").alias("example_category"),
            (F.count(F.lit(1)) > 1).alias("has_collision"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling — recommender training pairs
# ---------------------------------------------------------------------------

NEG_PER_USER = 3
NEG_CAND_MOD = 50  # candidate parts: partkey % 50 == 0 (bounded candidate set)


@register(
    "negative_sampling_pairs",
    oracle=f"""
    WITH cand AS (
        SELECT p_partkey FROM part WHERE p_partkey % {NEG_CAND_MOD} = 0
    ),
    bought AS (
        SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    scored AS (
        SELECT c.c_custkey AS custkey, p.p_partkey AS partkey,
               md5(CAST(c.c_custkey AS VARCHAR) || ':' ||
                   CAST(p.p_partkey AS VARCHAR)) AS rkey
        FROM customer c CROSS JOIN cand p
        WHERE NOT EXISTS (
            SELECT 1 FROM bought b
            WHERE b.custkey = c.c_custkey AND b.partkey = p.p_partkey
        )
    )
    SELECT custkey, partkey, rank
    FROM (
        SELECT custkey, partkey,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY custkey ORDER BY rkey, partkey
               ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= {NEG_PER_USER}
    """,
    doc=f"Deterministic negative sampling for recommender training: per "
    f"customer, {NEG_PER_USER} parts they never purchased, chosen by "
    "md5(customer:part) order from a bounded candidate set — "
    "reproducible across runs and engines (no RNG), uniform-ish via the "
    "hash, and anti-joined against the positives so no negative is a "
    "false negative.",
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the candidate set is a sampled slice of the item dimension
    (broadcast-sized by construction — the standard recipe samples
    candidates per batch, not the full catalog); the positives
    anti-join shuffles on (customer, part); the per-customer top-K is a
    customer-partitioned window, no global sort. Hash-keyed order makes
    the 'random' sample a pure function of the pair — rerunning a
    failed shard regenerates identical training data."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    cand = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % NEG_CAND_MOD == 0)
        .select(F.col("p_partkey").alias("partkey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bought = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey")
        )
        .distinct()
    )
    pairs = cust.crossJoin(F.broadcast(cand)).join(
        bought, ["custkey", "partkey"], "left_anti"
    )
    rkey = F.md5(
        F.concat_ws(":", F.col("custkey").cast("string"), F.col("partkey").cast("string"))
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("custkey").orderBy(rkey, "partkey")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= NEG_PER_USER)
        .select("custkey", "partkey", "rank")
    )


# ---------------------------------------------------------------------------
# Calendar dimension build — the warehouse date spine
# ---------------------------------------------------------------------------


@register(
    "calendar_dim_build",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
               CAST(MAX(o_orderdate) AS DATE) AS hi
        FROM orders
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    )
    SELECT CAST(strftime(d, '%Y') AS INT) AS year,
           CAST(quarter(d) AS INT) AS quarter,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_weekend_days,
           CAST(SUM(CASE WHEN d = last_day(d) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_month_ends
    FROM spine GROUP BY 1, 2
    """,
    doc="Calendar dimension build: a gap-free date spine spanning the "
    "fact's date range, generated in-engine (sequence/generate_series — "
    "no source table), with derived attributes rolled up per quarter: "
    "day counts, weekend days, month-end markers. The first script of "
    "every warehouse build, and the join spine behind the engine's "
    "gap-fill and cohort queries.",
)
def calendar_dim_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spine is sequence(lo, hi) exploded — O(days) rows from a
    2-scalar aggregate, no data shuffle at all; attributes are pure date
    expressions. DOW convention note: Spark dayofweek is 1=Sunday..7,
    DuckDB dayofweek is 0=Sunday..6 — the weekend test is written
    against each engine's own convention rather than shifting one to
    the other (the single most common cross-engine calendar bug)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    return spine.groupBy(
        F.year("d").alias("year"), F.quarter("d").cast("int").alias("quarter")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.dayofweek("d").isin(1, 7).cast("int"))
        .cast("bigint")
        .alias("n_weekend_days"),
        F.sum((F.col("d") == F.last_day("d")).cast("int"))
        .cast("bigint")
        .alias("n_month_ends"),
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding — exact rational form
# ---------------------------------------------------------------------------


@register(
    "target_encoding_loo",
    oracle="""
    WITH spend AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                    AS BIGINT) AS own_cents
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    grp AS (
        SELECT c_nationkey,
               CAST(SUM(own_cents) AS BIGINT) AS grp_cents,
               CAST(COUNT(*) AS BIGINT) AS grp_n
        FROM spend GROUP BY 1
    )
    SELECT s.c_custkey AS custkey,
           s.c_nationkey AS nationkey,
           CAST(g.grp_cents - s.own_cents AS BIGINT) AS loo_numerator_cents,
           CAST(g.grp_n - 1 AS BIGINT) AS loo_denominator,
           CAST(g.grp_cents - s.own_cents AS DOUBLE) / (g.grp_n - 1)
               AS loo_encoding_cents
    FROM spend s JOIN grp g ON s.c_nationkey = g.c_nationkey
    """,
    doc="Leave-one-out target encoding of nation by customer spend: each "
    "customer's encoding is the mean spend of the OTHER customers in "
    "their nation — (group sum − own) / (group count − 1), carried as "
    "exact integer cents with the single per-row division last. The "
    "self-exclusion is what blocks target leakage; a plain group-mean "
    "encoding memorizes each row's own label.",
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape: one fact aggregate to per-entity labels, one group
    aggregate, one broadcast join back — two shuffles total, no window,
    no per-row subquery (the textbook LOO formula is a correlated
    aggregate; re-expressed as group-total-minus-own it is pure
    hash-aggregate algebra that runs at any scale). Exactness: integer
    cents end-to-end, so the encoding is a ratio of exact integers —
    per-row IEEE division, never a float accumulation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        cust.join(
            orders.select(
                F.col("o_custkey").alias("c_custkey"),
                F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            ),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("own_cents"))
    )
    grp = spend.groupBy("c_nationkey").agg(
        F.sum("own_cents").cast("bigint").alias("grp_cents"),
        F.count(F.lit(1)).alias("grp_n"),
    )
    return spend.join(F.broadcast(grp), "c_nationkey").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
        (F.col("grp_cents") - F.col("own_cents"))
        .cast("bigint")
        .alias("loo_numerator_cents"),
        (F.col("grp_n") - 1).cast("bigint").alias("loo_denominator"),
        (
            (F.col("grp_cents") - F.col("own_cents")).cast("double")
            / (F.col("grp_n") - 1)
        ).alias("loo_encoding_cents"),
    )


@register(
    "json_schema_discovery",
    oracle="""
    WITH payloads AS (
        SELECT event_id,
               '{"k": ' || CAST(event_id % 100 AS VARCHAR)
               || CASE WHEN event_id % 2 = 0
                       THEN ', "device": "mobile"' ELSE '' END
               || CASE WHEN event_id % 3 = 0
                       THEN ', "country": "US"' ELSE '' END
               || CASE WHEN event_id % 7 = 0
                       THEN ', "campaign": "c' || CAST(event_id % 5 AS VARCHAR)
                            || '"' ELSE '' END
               || '}' AS j
        FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM payloads),
    keys AS (
        SELECT unnest(json_keys(j)) AS key FROM payloads
    )
    SELECT k.key,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS DOUBLE) / t.n AS coverage
    FROM keys k CROSS JOIN tot t
    GROUP BY 1, t.n
    """,
    doc="JSON schema discovery: semi-structured event payloads (synthesized "
    "with deterministic optional keys, since the fixture's props carry "
    "one fixed key) profiled into a key-frequency/coverage table via "
    "each engine's native JSON key extraction — the first query run "
    "against any new semi-structured feed, deciding which keys deserve "
    "promotion to typed columns (high coverage) and which stay in the "
    "map (sparse tail).",
)
def json_schema_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key extraction is JVM-native (json_object_keys) fused into the
    scan; the profile is one explode + aggregate with a single-row total
    broadcast. At 100 TB this is also the guardrail against schema-drift
    surprises: run per ingest batch, diff coverage against yesterday's."""
    ev = load_table(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"k": '),
        (F.col("event_id") % 100).cast("string"),
        F.when(F.col("event_id") % 2 == 0, F.lit(', "device": "mobile"')).otherwise(""),
        F.when(F.col("event_id") % 3 == 0, F.lit(', "country": "US"')).otherwise(""),
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(
                F.lit(', "campaign": "c'),
                (F.col("event_id") % 5).cast("string"),
                F.lit('"'),
            ),
        ).otherwise(""),
        F.lit("}"),
    )
    payloads = ev.select("event_id", j.alias("j"))
    tot = payloads.agg(F.count(F.lit(1)).alias("n"))
    keys = payloads.select(
        F.explode(F.expr("json_object_keys(j)")).alias("key")
    )
    return (
        keys.crossJoin(F.broadcast(tot))
        .groupBy("key", "n")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n")).alias("coverage"),
        )
    )


@register(
    "json_promoted_columns_rollup",
    oracle="""
    WITH payloads AS (
        SELECT event_id,
               '{"k": ' || CAST(event_id % 100 AS VARCHAR)
               || CASE WHEN event_id % 2 = 0
                       THEN ', "device": "mobile"' ELSE '' END
               || CASE WHEN event_id % 3 = 0
                       THEN ', "country": "US"' ELSE '' END
               || '}' AS j
        FROM events
    )
    SELECT COALESCE(json_extract_string(j, '$.device'), 'unknown') AS device,
           COALESCE(json_extract_string(j, '$.country'), 'unknown') AS country,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(j, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k
    FROM payloads GROUP BY 1, 2
    """,
    doc="The promotion step after schema discovery: the high-coverage "
    "keys (device, country) extracted into typed columns with "
    "NULL→'unknown' defaulting, plus a numeric field cast and "
    "aggregated — the JSON-path extraction pattern (get_json_object / "
    "json_extract_string) both engines fuse into the scan, and the "
    "column shapes a downstream table would persist.",
)
def json_promoted_columns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction stays JVM-native and codegen'd; promoting ONLY
    discovered high-coverage keys (json_schema_discovery's output) is
    what keeps the typed schema small while the sparse tail stays in
    the raw payload — the semi-structured design every event warehouse
    lands on."""
    ev = load_table(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"k": '),
        (F.col("event_id") % 100).cast("string"),
        F.when(F.col("event_id") % 2 == 0, F.lit(', "device": "mobile"')).otherwise(""),
        F.when(F.col("event_id") % 3 == 0, F.lit(', "country": "US"')).otherwise(""),
        F.lit("}"),
    )
    payloads = ev.select(j.alias("j"))
    return (
        payloads.select(
            F.coalesce(
                F.get_json_object("j", "$.device"), F.lit("unknown")
            ).alias("device"),
            F.coalesce(
                F.get_json_object("j", "$.country"), F.lit("unknown")
            ).alias("country"),
            F.get_json_object("j", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("device", "country")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )
