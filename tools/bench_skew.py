#!/usr/bin/env python
"""Measured skew-join proof (VERDICT r2 item 8).

Builds a deliberately skewed fact at $SPARK_GRAFT_SF_DIR (default sf0.1):
half of an amplified lineitem lands on ONE hot supplier key (the reference's
'MC' client shape, S1:97), then joins it to the supplier dim under three
plans and prints wall seconds for each:

  plain_noaqe  — sort-merge join, AQE skew handling OFF: the hot key's
                 entire partition is one straggler task (the 100 TB
                 failure mode, reproduced in miniature).
  plain_aqe    — same join with AQE skewJoin ON: runtime partition
                 splitting recovers most of the loss.
  salted       — operators.skew.salted_join (explicit deterministic
                 salting): the static fix that doesn't depend on runtime
                 stats, for when one key overwhelms even split partitions.

Broadcast is disabled for the measurement (a dim small enough to broadcast
would sidestep the shuffle entirely — at 100 TB the dim often isn't).
Row-count equality across all three plans is asserted. Results are
recorded in SCALING.md.
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
from etl_loading_scripts_spark.operators.skew import salted_join  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_KEY = 1
AMPLIFY = 8  # multiply lineitem rows so the hot partition is task-visible
N_SALT = 32


def build_inputs(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    # amplified fact: 8x rows, half of them remapped onto ONE hot key
    fact = (
        li.withColumn("__rep__", F.explode(F.sequence(F.lit(1), F.lit(AMPLIFY))))
        .withColumn(
            "k",
            F.when((F.col("l_orderkey") + F.col("__rep__")) % 2 == 0, F.lit(HOT_KEY))
            .otherwise(F.col("l_suppkey")),
        )
        .select("k", "l_quantity")
    )
    dim = load_table(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("k"), "s_name"
    )
    return fact, dim


def run_case(spark, name: str, make_joined) -> tuple[float, int]:
    t0 = time.time()
    joined = make_joined()
    n = joined.groupBy("s_name").agg(F.sum("l_quantity")).count()
    dt = time.time() - t0
    print(f"# {name}: {dt:.2f}s ({n} groups)", file=sys.stderr)
    return round(dt, 3), n


def main() -> None:
    spark = get_spark(app_name="bench_skew")
    spark.sparkContext.setLogLevel("ERROR")
    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact, dim = build_inputs(spark)
    fact.count()  # warm file listing

    results: dict[str, float] = {}
    groups: dict[str, int] = {}

    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["plain_noaqe"], groups["plain_noaqe"] = run_case(
        spark, "plain_noaqe", lambda: fact.hint("merge").join(dim, "k")
    )

    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["plain_aqe"], groups["plain_aqe"] = run_case(
        spark, "plain_aqe", lambda: fact.hint("merge").join(dim, "k")
    )

    results["salted"], groups["salted"] = run_case(
        spark, "salted", lambda: salted_join(fact, dim, "k", n_salt=N_SALT)
    )

    conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert len(set(groups.values())) == 1, f"result mismatch: {groups}"
    out = {
        "sf_dir": SF_DIR,
        "amplify": AMPLIFY,
        "n_salt": N_SALT,
        "seconds": results,
        "speedup_salted_vs_plain_noaqe": round(
            results["plain_noaqe"] / results["salted"], 2
        ),
        "speedup_aqe_vs_plain_noaqe": round(
            results["plain_noaqe"] / results["plain_aqe"], 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
