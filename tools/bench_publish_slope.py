#!/usr/bin/env python
"""Incremental-publish SLOPE vs HISTORY LENGTH (round 10).

The round's headline claim is that the staged publish went from
O(history) to O(month). The 100x bench scales MONTH SIZE (amplify
multiplies rows within months), which moves both paths equally — the
slope that separates them is history LENGTH at fixed month size. This
tool publishes a synthetic month-partitioned fact with a constant
1M rows/month at 40 and 80 months of history and measures:

- the BOOTSTRAP publish (full fact write + full month-close z-order):
  must scale ~linearly with history (2x months -> ~2x wall) — this is
  what EVERY publish paid before round 10 (twice);
- the INCREMENTAL publish of one month (merge_cow + that month's
  z-order): must stay ~FLAT as history doubles — the O(month) path.

Identical final table contents asserted per scale (merge result equals
the bootstrap-of-updated-frame rollup). Prints ONE JSON line; the
table lives in SCALING.md r10.
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

from etl_loading_scripts_spark.operators import deltalog as dl
from etl_loading_scripts_spark.session import get_spark

ROWS_PER_MONTH = 1_000_000


def month_dk(i):
    """YYYYMMDD datekey for month index i (12 months/year from 1990)."""
    return (1990 + i // 12) * 10000 + (i % 12 + 1) * 100 + 1


def fact_frame(spark, n_months: int, salt: int):
    months = spark.createDataFrame(
        [(i, month_dk(i)) for i in range(n_months)], "mi int, dk0 int"
    )
    return (
        spark.range(ROWS_PER_MONTH)
        .crossJoin(F.broadcast(months))
        .select(
            (F.col("id") * n_months + F.col("mi")).alias("txn_id"),
            (F.col("dk0") + F.col("id") % 28).alias("datekey"),
            ((F.col("id") * 31 + F.col("mi") + salt) % 997).alias("amount"),
        )
    )


def measure(spark, n_months: int) -> dict:
    base = tempfile.mkdtemp(prefix=f"slope{n_months}_")
    try:
        fact = fact_frame(spark, n_months, salt=0)
        opt = {"fact": {"zorder_by": ["datekey"]}}
        inc = {"fact": {"on": ["txn_id"], "datekey_col": "datekey",
                        "window": None, "delete_unmatched_source": True}}
        t0 = time.time()
        dl.publish_set_deltalog([("fact", fact)], base,
                                incremental=inc, optimize=opt)
        boot = round(time.time() - t0, 3)
        # steady state: re-publish with ONLY the LAST month changed
        last_lo = month_dk(n_months - 1)
        fact2 = fact_frame(spark, n_months, salt=7)
        t0 = time.time()
        sv = dl.publish_set_deltalog(
            [("fact", fact2)], base,
            incremental={"fact": {**inc["fact"],
                                  "window": (last_lo, last_lo + 30)}},
            optimize=opt,
        )
        incr = round(time.time() - t0, 3)
        got = dl.read_published_set_deltalog(spark, base, version=sv)["fact"]
        exp = fact.filter(
            ~F.col("datekey").between(last_lo, last_lo + 30)
        ).unionByName(fact2.filter(F.col("datekey").between(last_lo, last_lo + 30)))
        g = got.agg(F.count(F.lit(1)), F.sum("amount")).first()
        e = exp.agg(F.count(F.lit(1)), F.sum("amount")).first()
        assert tuple(g) == tuple(e), (tuple(g), tuple(e))
        return {
            "months": n_months,
            "fact_rows": n_months * ROWS_PER_MONTH,
            "bootstrap_publish_wall": boot,
            "incremental_publish_wall": incr,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="bench_publish_slope")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "incremental_publish_slope_vs_history"}
    for m in (40, 80):
        out[f"m{m}"] = measure(spark, m)
        print(f"# {m} months: {out[f'm{m}']}", file=sys.stderr, flush=True)
    out["bootstrap_ratio_80_over_40"] = round(
        out["m80"]["bootstrap_publish_wall"]
        / out["m40"]["bootstrap_publish_wall"], 2,
    )
    out["incremental_ratio_80_over_40"] = round(
        out["m80"]["incremental_publish_wall"]
        / out["m40"]["incremental_publish_wall"], 2,
    )
    out["results_equal"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
