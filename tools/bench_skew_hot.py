#!/usr/bin/env python
"""Planted-skew stress for the three worst 4x-scale-slope queries
(VERDICT r4 item 3): sessionize_events (1.60x), dedup_minhash_lsh
(1.54x), update_fact_sentinel (1.41x).

Each experiment amplifies the sf0.1 input 4x and hands ONE key ~30% of
all rows — the reference's 'MC' hot-client hazard (S1:97) — then measures
the query's plain plan against the engine's skew defense:

  join_hot       update_fact_sentinel's shape (fact-side natural-key
                 join): sort-merge with AQE skew OFF vs ON vs
                 operators.skew.salted_join. Broadcast disabled so the
                 shuffle (the 100 TB path) is what's measured; result
                 equality asserted.
  sessionize_hot the user-grain window: plain sessionize (whale user =
                 one task, AQE can't split a window key) vs the
                 two-phase sessionize_events_bucketed (local windows
                 over (user, day) + bucket-grain boundary stitch).
                 Full-result equality asserted.
  lsh_hot        MinHash-LSH with 30% byte-identical documents (one
                 white-hot band bucket, quadratic candidates) vs the
                 pipeline defense: exact-dedup FIRST (collapse identical
                 md5 to one representative), then LSH — the order
                 corpus_prep_e2e already uses. Candidate volumes differ
                 by design (the whale clique never enumerates); both
                 pair counts print.

Prints one JSON line; results recorded in SCALING.md round 5.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_loading_scripts_spark.catalog import load_table  # noqa: E402
from etl_loading_scripts_spark.llm.dedup import (  # noqa: E402
    _shingles_spark,
    minhash_lsh_pairs,
)
from etl_loading_scripts_spark.operators.skew import salted_join  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402
from etl_loading_scripts_spark.streaming.events import (  # noqa: E402
    sessionize_bucketed_frame,
    sessionize_frame,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = int(os.environ.get("SKEW_HOT_AMPLIFY", "4"))
HOT_FRAC_MOD = 10
HOT_COPIES = int(os.environ.get("SKEW_HOT_COPIES", "3"))  # of 10 => hot fraction
N_SALT = 32


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = round(time.time() - t0, 3)
    print(f"# {label}: {dt}s -> {out}", file=sys.stderr)
    return dt, out


def exp_join_hot(spark):
    """update_fact_sentinel's join shape with a 30% hot natural key."""
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    fact = (
        orders.withColumn("__rep__", F.explode(F.sequence(F.lit(1), F.lit(AMPLIFY))))
        .withColumn(
            "k",
            F.when(
                (F.col("o_orderkey") + F.col("__rep__")) % HOT_FRAC_MOD < HOT_COPIES,
                F.lit(1),
            ).otherwise(F.col("o_orderkey") * AMPLIFY + F.col("__rep__")),
        )
        .select("k", F.col("o_custkey").alias("cust_fk"))
    )
    mapping = fact.select("k").distinct().withColumn("true_cust", F.col("k") % 1000)
    fact.count()
    mapping.count()

    def run(aqe_skew: bool, salted: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        joined = (
            salted_join(fact, mapping, "k", n_salt=N_SALT)
            if salted
            else fact.join(mapping, "k")
        )
        return (
            joined.select(F.coalesce("true_cust", "cust_fk").alias("c"))
            .groupBy((F.col("c") % 97).alias("g"))
            .count()
            .count()
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    res = {}
    res["noaqe"], n1 = timed("join_hot plain (AQE skew OFF)", lambda: run(False, False))
    res["aqe"], n2 = timed("join_hot plain (AQE skew ON)", lambda: run(True, False))
    res["salted"], n3 = timed("join_hot salted_join(32)", lambda: run(True, True))
    assert n1 == n2 == n3, (n1, n2, n3)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    return res


def exp_sessionize_hot(spark):
    """User-grain window with one user owning ~30% of all events."""
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    hot = (
        ev.withColumn("__rep__", F.explode(F.sequence(F.lit(1), F.lit(AMPLIFY))))
        .withColumn(
            "user_id",
            F.when(
                (F.col("event_id") + F.col("__rep__")) % HOT_FRAC_MOD < HOT_COPIES, F.lit(-1)
            ).otherwise(F.col("user_id")),
        )
        .withColumn(
            "event_id", F.col("event_id") * (AMPLIFY + 1) + F.col("__rep__")
        )
        .select("user_id", "event_id", "ts", "value")
    )
    hot.count()

    def summarize(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("session_seq") * F.col("n_events")).alias("cks"),
        ).collect()[0]
        return (row["n"], row["cks"])

    res = {}
    res["plain_window"], s1 = timed(
        "sessionize_hot plain user-window", lambda: summarize(sessionize_frame(hot))
    )
    res["bucketed"], s2 = timed(
        "sessionize_hot two-phase bucketed",
        lambda: summarize(sessionize_bucketed_frame(hot)),
    )
    assert s1 == s2, (s1, s2)
    return res


def exp_lsh_hot(spark):
    """LSH with 30% byte-identical docs (one quadratic band bucket)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    whale = docs.agg(F.max("text").alias("t")).collect()[0]["t"]
    hot = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % HOT_FRAC_MOD < HOT_COPIES, F.lit(whale)).otherwise(
            F.col("text")
        ),
    )
    hot.count()

    res = {}
    res["plain_lsh"], n_pairs = timed(
        "lsh_hot plain (whale clique enumerated)",
        lambda: minhash_lsh_pairs(_shingles_spark(hot, materialize=False)).count(),
    )

    def collapsed():
        reps = hot.groupBy(F.md5("text").alias("h")).agg(
            F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
        ).select("doc_id", "text")
        return minhash_lsh_pairs(_shingles_spark(reps, materialize=False)).count()

    res["exact_collapse_first"], n_pairs2 = timed(
        "lsh_hot exact-dedup-first (corpus_prep_e2e's order)", collapsed
    )
    res["pairs_plain"] = n_pairs
    res["pairs_collapsed"] = n_pairs2
    return res


def main() -> None:
    spark = get_spark(app_name="bench_skew_hot")
    spark.sparkContext.setLogLevel("ERROR")
    wanted = os.environ.get("SKEW_HOT_EXPS", "join,sessionize,lsh").split(",")
    out = {
        "sf_dir": SF_DIR,
        "amplify": AMPLIFY,
        "hot_frac": HOT_COPIES / 10,
    }
    if "join" in wanted:
        out["join_hot"] = exp_join_hot(spark)
    if "sessionize" in wanted:
        out["sessionize_hot"] = exp_sessionize_hot(spark)
    if "lsh" in wanted:
        out["lsh_hot"] = exp_lsh_hot(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
