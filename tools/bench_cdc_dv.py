#!/usr/bin/env python
"""Round-9 feature cost measurements at 100x-amplified scale.

Two claims, measured instead of asserted:

1. **Multi-commit CDC netting** (`delta_table_changes` over (0, 3]):
   the change-file fast path vs the two-snapshot fallback on a
   month-partitioned fact built from the 100x orders (~15M rows,
   3 CDC-encoded merge commits touching one month). The fallback reads
   BOTH full snapshots; the fast path reads only the per-commit change
   files and nets them.

2. **Deletion-vector DML**: a 10-row DELETE against the same fact via
   `deletion_vectors=True` vs the copy-on-write rewrite — wall and
   bytes written. The DV claim is O(deleted rows); the rewrite pays
   O(affected files) regardless of how few rows match.

Prints ONE JSON line; the table lives in SCALING.md r9. Identical
results asserted for both comparisons.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_loading_scripts_spark.operators import deltalog as dl
from etl_loading_scripts_spark.session import get_spark
from tools.bench_scale100 import DST, amplify


def main() -> None:
    spark = get_spark(app_name="bench_cdc_dv")
    spark.sparkContext.setLogLevel("ERROR")
    amplify(spark)  # reuses /tmp/sf100x

    table = "/tmp/bench_cdc_dv_fact"
    if os.path.isdir(table):
        shutil.rmtree(table)
    orders = spark.read.parquet(f"{DST}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("month"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("amount"),
    ).withColumn("datekey", F.col("month") * 100 + 1)
    t0 = time.time()
    dl.write_delta_table(orders, table, partition_by=["month"])
    m0 = orders.agg(F.min("month")).first()[0]
    in_m0 = orders.filter(F.col("month") == m0).drop("month")
    for wave, bump in ((4, 1000), (4, 2000), (9, 7000)):
        src = in_m0.filter(F.col("k") % wave == 0).select(
            "k", "datekey",
            (F.col("amount") + bump).cast("decimal(18,4)").alias("amount"),
        )
        dl.merge_cow_deltalog(spark, table, src, on=["k"], datekey_col="datekey")
    t_plant = round(time.time() - t0, 1)
    print(f"# planted 3-commit CDC fact in {t_plant}s", file=sys.stderr)

    def agg_rows(df):
        return sorted(
            tuple(r)
            for r in df.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("amount").cast("double").alias("s"))
            .collect()
        )

    t0 = time.time()
    fast = dl.delta_table_changes(spark, table, 0, 3, on=["month", "k"])
    fast_rows = agg_rows(fast)
    t_fast = round(time.time() - t0, 3)
    assert all(dl._CDC_DIR in f for f in fast.inputFiles())
    # force the fallback: a different grain string defeats the key match
    t0 = time.time()
    slow = dl._keyed_diff(
        dl.read_delta_table(spark, table, version=0),
        dl.read_delta_table(spark, table, version=3),
        ["month", "k"],
    )
    slow_rows = agg_rows(slow)
    t_slow = round(time.time() - t0, 3)
    assert fast_rows == slow_rows, (fast_rows, slow_rows)

    # DV delete vs rewrite delete: same predicate (10 rows of m0)
    probe = in_m0.orderBy("k").limit(10).select("k").collect()
    ks = ",".join(str(r.k) for r in probe)
    pred = f"month = {m0} AND k IN ({ks})"
    copy = table + "_rw"
    if os.path.isdir(copy):
        shutil.rmtree(copy)
    shutil.copytree(table, copy)
    t0 = time.time()
    r_dv = dl.delete_delta(spark, table, pred, deletion_vectors=True)
    t_dv = round(time.time() - t0, 3)
    t0 = time.time()
    r_rw = dl.delete_delta(spark, copy, pred)
    t_rw = round(time.time() - t0, 3)
    assert r_dv["rows_deleted"] == r_rw["rows_deleted"] == 10
    a = dl.read_delta_table(spark, table).filter(f"month = {m0}").count()
    b = dl.read_delta_table(spark, copy).filter(f"month = {m0}").count()
    assert a == b, (a, b)

    out = {
        "metric": "cdc_netting_and_dv_100x",
        "fact_rows": orders.count(),
        "cdc_fast_s": t_fast,
        "cdc_fallback_s": t_slow,
        "cdc_speedup": round(t_slow / t_fast, 1),
        "dv_delete_s": t_dv,
        "rewrite_delete_s": t_rw,
        "dv_bytes_written": r_dv["bytes_written"],
        "rewrite_bytes_written": r_rw["bytes_written"],
        "bytes_ratio": round(
            r_rw["bytes_written"] / max(1, r_dv["bytes_written"]), 1
        ),
        "results_equal": True,
    }
    print(json.dumps(out))
    shutil.rmtree(copy, ignore_errors=True)


if __name__ == "__main__":
    main()
