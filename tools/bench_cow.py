#!/usr/bin/env python
"""Measure the file-level-rewrite win: COW month-scoped MERGE vs the
full-table join-merge-and-rewrite, same source, same semantics.

The COW path reads and rewrites only the restated month's partition; the
full path joins the whole fact and rewrites every byte. The ratio is the
operative number for the reference's monthly restatement at 100 TB — it
should track #months (data touched), not constant factors.

Usage: python tools/bench_cow.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_loading_scripts_spark.operators.cow import (  # noqa: E402
    list_partition_files,
    merge_cow_partitioned,
)
from etl_loading_scripts_spark.operators.mutations import merge_upsert  # noqa: E402
from etl_loading_scripts_spark.queries.cow_queries import _order_fact  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402
from etl_loading_scripts_spark.sources.io import write_fact_partitioned  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="bench-cow")
    base = _order_fact(spark, sf_dir)

    busiest = (
        base.groupBy((F.col("datekey") / 100).cast("int").alias("m"))
        .count()
        .orderBy(F.desc("count"), F.desc("m"))
        .first()["m"]
    )
    source = (
        base.filter((F.col("datekey") / 100).cast("int") == busiest)
        .filter(F.col("k") % 2 == 0)
        .withColumn("price", (F.col("price") * 2).cast("decimal(18,4)"))
    )
    n_months = base.select((F.col("datekey") / 100).cast("int")).distinct().count()

    results = {}
    for mode in ("cow", "full"):
        path = f"/tmp/bench_cow_{mode}"
        shutil.rmtree(path, ignore_errors=True)
        write_fact_partitioned(base, path)
        before = list_partition_files(spark, path)
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            if mode == "cow":
                merge_cow_partitioned(spark, path, source, on=["k"])
            else:
                target = spark.read.parquet(path).drop("month")
                merged = merge_upsert(target, source, on=["k"])
                staging = f"{path}__next"
                write_fact_partitioned(merged, staging)
                shutil.rmtree(path)
                shutil.move(staging, path)
            best = min(best, time.monotonic() - t0)
        after = list_partition_files(spark, path)
        rewritten = [m for m in after if after[m] != before.get(m)]
        results[mode] = round(best, 3)
        results[f"{mode}_rows"] = spark.read.parquet(path).count()
        results[f"{mode}_months_rewritten"] = len(rewritten)
        results[f"{mode}_bytes_rewritten"] = sum(
            sz for m in rewritten for (_, sz, _) in after[m]
        )

    assert results["cow_rows"] == results["full_rows"]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_months": n_months,
                "restated_month": busiest,
                "cow_merge_s": results["cow"],
                "full_rewrite_s": results["full"],
                "speedup": round(results["full"] / results["cow"], 2),
                "cow_months_rewritten": results["cow_months_rewritten"],
                "full_months_rewritten": results["full_months_rewritten"],
                "cow_bytes_rewritten": results["cow_bytes_rewritten"],
                "full_bytes_rewritten": results["full_bytes_rewritten"],
                "bytes_ratio": round(
                    results["full_bytes_rewritten"]
                    / max(results["cow_bytes_rewritten"], 1),
                    1,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
