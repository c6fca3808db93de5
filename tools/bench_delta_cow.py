#!/usr/bin/env python
"""Measure the month-grain COW win on the Delta log (round 7): a
one-month increment merged into a month-partitioned sf0.1 fact via
`merge_cow_deltalog` (only the affected month's files rewritten) vs the
same increment through the full-table `merge_upsert_deltalog`. The
claim under test is the 100 TB posture: a monthly increment should cost
O(one month), not O(history). Prints ONE JSON line; numbers live in
SCALING.md r7."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.functions import tsql
from etl_loading_scripts_spark.operators import deltalog as dl
from etl_loading_scripts_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, path):
    if os.path.isdir(path):
        shutil.rmtree(path)
    orders = load_table(spark, SRC, "orders").select(
        F.col("o_orderkey").alias("k"),
        tsql.datekey(F.to_date("o_orderdate")).alias("datekey"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("amount"),
    )
    fact = orders.withColumn("month", (F.col("datekey") / 100).cast("int"))
    # ~4 files per month so the file-level claim is visible
    fact = fact.repartition(4, "k")
    dl.write_delta_table(fact, path, partition_by=["month"])
    return orders


def main():
    spark = get_spark(app_name="bench_delta_cow")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/delta_cow_bench"
    orders = build(spark, os.path.join(base, "cow"))
    build(spark, os.path.join(base, "full"))

    m0 = orders.agg(
        F.min((tsql.datekey(F.to_date(F.lit("1995-06-15"))) / 100).cast("int"))
    ).first()[0]
    src = (
        orders.withColumn("m", (F.col("datekey") / 100).cast("int"))
        .filter(F.col("m") == int(m0))
        .drop("m")
        .withColumn("amount", (F.col("amount") + 1000).cast("decimal(18,4)"))
    )
    n_src = src.count()

    t0 = time.time()
    res = dl.merge_cow_deltalog(
        spark, os.path.join(base, "cow"), src, on=["k"], datekey_col="datekey"
    )
    cow_wall = round(time.time() - t0, 3)

    t0 = time.time()
    src2 = src.withColumn("month", (F.col("datekey") / 100).cast("int"))
    dl.merge_upsert_deltalog(
        spark, os.path.join(base, "full"), src2, on=["k"]
    )
    full_wall = round(time.time() - t0, 3)

    active_full, _, _ = dl._snapshot_state(os.path.join(base, "full"), None)
    out = {
        "source_rows": n_src,
        "month": int(m0),
        "cow": {
            "wall_sec": cow_wall,
            "files_removed": res["files_removed"],
            "files_kept_untouched": res["files_kept"],
            "touch_fraction": round(
                res["files_removed"]
                / max(1, res["files_removed"] + res["files_kept"]),
                4,
            ),
        },
        "full_table_merge": {
            "wall_sec": full_wall,
            "files_rewritten": len(active_full),
        },
        "wall_ratio_full_over_cow": round(full_wall / cow_wall, 2),
    }
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
