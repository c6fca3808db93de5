#!/usr/bin/env python
"""Month-close maintenance benefit, measured (round 9, VERDICT r8 item 4).

The staged load's publish now OPTIMIZE+Z-ORDERs the fact by
(datekey, restaurant_key) between the table write and the set commit
(``month_close=True``). This tool runs the 100x-amplified staged load
WITH and WITHOUT month_close and measures what the maintenance buys the
NEXT month's reader: a (datekey-window x restaurant-range) box read —
the shape of S5's BI aggregations — in files touched and wall seconds,
plus what it costs (s6 publish wall). Identical query results asserted.
Prints ONE JSON line; the table lives in SCALING.md r9.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_loading_scripts_spark.operators.deltalog import read_delta_table
from etl_loading_scripts_spark.pipeline.domain import build_domain
from etl_loading_scripts_spark.pipeline.monthly_load import full_window
from etl_loading_scripts_spark.pipeline.staged import run_monthly_load_staged
from etl_loading_scripts_spark.session import get_spark
from tools.bench_scale100 import DST, amplify


def main() -> None:
    spark = get_spark(app_name="bench_month_close")
    spark.sparkContext.setLogLevel("ERROR")
    amplify(spark)

    out = {}
    results = {}
    for mc in (False, True):
        dom = build_domain(spark, DST)
        window = full_window(dom)
        stage_dir = tempfile.mkdtemp(prefix=f"mc{int(mc)}_")
        t0 = time.time()
        out1, _, report = run_monthly_load_staged(
            spark, dom, window, stage_dir, month_close=mc
        )
        wall_load = round(time.time() - t0, 3)
        fact_path = os.path.join(stage_dir, "publish", "fact_transaction")
        full = read_delta_table(spark, fact_path)
        lo_dk = full.agg(F.min("datekey")).first()[0]
        box = {
            "datekey": (lo_dk, lo_dk + 6),
            "restaurant_key": (100, 200),
        }
        pred = F.col("datekey").between(*box["datekey"]) & F.col(
            "restaurant_key"
        ).between(*box["restaurant_key"])
        t0 = time.time()
        pruned = read_delta_table(spark, fact_path, stats_filter=box)
        agg = pruned.filter(pred).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount").cast("double").alias("s"),
        ).first()
        wall_read = round(time.time() - t0, 3)
        results[mc] = (agg.n, agg.s)
        out["month_close" if mc else "plain"] = {
            "load_wall": wall_load,
            "s6_publish_wall": next(
                r["wall_sec"] for r in report
                if r["stage"] == "s6_publish_deltalog"
            ),
            "box_files_read": len(pruned.inputFiles()),
            "box_files_total": len(full.inputFiles()),
            "box_read_wall": wall_read,
        }
        print(f"# mc={mc}: {out['month_close' if mc else 'plain']}",
              file=sys.stderr, flush=True)
        if mc:
            # round 10 (the r9 VERDICT's top item): the INCREMENTAL
            # publish — a SECOND staged load over ONE month into the
            # same warehouse. Its s6 merges only that month's files
            # (merge_cow_deltalog) and z-orders only that month, so
            # its publish wall is O(month): compare
            # s6_publish_wall_month2 with run 1's bootstrap
            # s6_publish_wall (a full fact write + full z-order).
            m2 = (
                read_delta_table(spark, fact_path)
                .select((F.col("datekey") / 100).cast("int").alias("m"))
                .distinct().orderBy("m").limit(2).collect()[1].m
            )
            t0 = time.time()
            _, _, report2 = run_monthly_load_staged(
                spark, out1, (m2 * 100 + 1, m2 * 100 + 31), stage_dir,
                month_close=True,
            )
            s6_2 = next(
                r for r in report2 if r["stage"] == "s6_publish_deltalog"
            )
            out["incremental_month2"] = {
                "load_wall": round(time.time() - t0, 3),
                "s6_publish_wall": s6_2["wall_sec"],
                "set_version": s6_2["set_version"],
            }
            print(f"# incremental m2={m2}: {out['incremental_month2']}",
                  file=sys.stderr, flush=True)
        shutil.rmtree(stage_dir, ignore_errors=True)
    assert results[False] == results[True], results  # pruning lossless
    out["metric"] = "month_close_read_pruning_100x"
    out["results_equal"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
