#!/usr/bin/env python
"""Measured bucketed-layout win (SCALING.md companion to bench_skew).

The plan tests prove the bucketed fact↔mapping join has no fact-side
Exchange; this measures what that is worth in wall time. The fact
(amplified lineitem keyed by l_orderkey) is joined to a month-sized
mapping twice:

  plain     — both sides shuffle (sort-merge on the key)
  bucketed  — fact pre-bucketed on the key (saveAsTable bucketBy): only
              the mapping side exchanges; the fact reads its buckets

Broadcast disabled for the measurement: a broadcastable mapping would
bypass the shuffle on BOTH plans and measure nothing — at 100 TB the
monthly mapping is often above broadcast size. Row counts asserted equal.
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
from etl_loading_scripts_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPLIFY = 8
N_BUCKETS = 32
TABLE = "bench_bucketed_fact"


def main() -> None:
    spark = get_spark(app_name="bench_bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    fact = li.withColumn(
        "__rep__", F.explode(F.sequence(F.lit(1), F.lit(AMPLIFY)))
    ).select("l_orderkey", "l_quantity")
    mapping = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", (F.col("o_orderkey") % 97).alias("grp"))
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    fact.count()  # warm listing

    def run(name, f):
        t0 = time.time()
        n = (
            f.hint("merge")
            .join(mapping, "l_orderkey")
            .groupBy("grp")
            .agg(F.sum("l_quantity"))
            .count()
        )
        dt = round(time.time() - t0, 3)
        print(f"# {name}: {dt}s ({n} groups)", file=sys.stderr)
        return dt, n

    results, groups = {}, {}
    results["plain"], groups["plain"] = run("plain", fact)

    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    t0 = time.time()
    (
        fact.write.mode("overwrite")
        .format("parquet")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(TABLE)
    )
    layout_cost = round(time.time() - t0, 3)
    bucketed = spark.table(TABLE)
    results["bucketed"], groups["bucketed"] = run("bucketed", bucketed)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    assert len(set(groups.values())) == 1, f"result mismatch: {groups}"
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "amplify": AMPLIFY,
                "n_buckets": N_BUCKETS,
                "seconds": results,
                "one_time_layout_write_sec": layout_cost,
                "speedup_bucketed_vs_plain": round(
                    results["plain"] / results["bucketed"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
