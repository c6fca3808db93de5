#!/usr/bin/env python
"""Measured JVM-expression vs Python-UDF cost (SCALING.md companion).

The engine's rule — parity paths use built-in expressions only, Python
is allowed solely in Arrow-batched kernels on an allow-list
(tests/test_plans.py) — is a design assertion; this measures what it is
worth. The same computation (md5 fingerprint of a concatenated line key,
then a checksum aggregate over all rows) runs three ways over the sf0.1
lineitem (~600k rows):

  builtin     — whole-stage codegen, zero Python
  pandas_udf  — Arrow-batched Python (the realistic "my kernel isn't
                expressible" path)
  python_udf  — row-at-a-time Python UDF (the anti-pattern)

Two workloads: an md5 fingerprint (flatters Python — hashlib is C) and
the reference's normalize chain (lower + regex scrub + trim — the shape
of most real ETL string work). Identical results asserted. Prints one
JSON line with best-of-3 walls per workload.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import StringType  # noqa: E402

from etl_loading_scripts_spark.catalog import load_table  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def checksum(df_with_fp):
    # first 8 hex chars as int, summed — an order-insensitive witness
    return df_with_fp.agg(
        F.sum(F.conv(F.substring("fp", 1, 8), 16, 10).cast("long")).alias("c")
    ).collect()[0]["c"]


def timed(fn):
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        v = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, v


def main() -> None:
    spark = get_spark(app_name="bench_udf")
    spark.sparkContext.setLogLevel("ERROR")

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_partkey").cast("string"),
            ).alias("key")
        )
        .cache()
    )
    li.count()  # materialize once so all three measure compute, not scan

    def builtin():
        return checksum(li.select(F.md5("key").alias("fp")))

    @F.pandas_udf(StringType())
    def md5_pandas(s: pd.Series) -> pd.Series:
        return s.map(lambda x: hashlib.md5(x.encode()).hexdigest())

    def arrow():
        return checksum(li.select(md5_pandas("key").alias("fp")))

    md5_row = F.udf(lambda x: hashlib.md5(x.encode()).hexdigest(), StringType())

    def row_udf():
        return checksum(li.select(md5_row("key").alias("fp")))

    # workload 2: normalize chain over a text-ish column
    import re

    docs = (
        load_table(spark, SF_DIR, "lineitem")
        .select(F.concat_ws(" ", "l_returnflag", "l_linestatus",
                            F.col("l_comment") if "l_comment" in
                            load_table(spark, SF_DIR, "lineitem").columns
                            else F.col("l_orderkey").cast("string")).alias("t"))
        .cache()
    )
    docs.count()

    def norm_checksum(df):
        return df.agg(
            F.sum(F.length("n").cast("long")).alias("c"),
        ).collect()[0]["c"]

    def n_builtin():
        return norm_checksum(
            docs.select(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(F.lower("t"), "[0-9]+", "#"),
                        "\\s+",
                        " ",
                    )
                ).alias("n")
            )
        )

    pat_num = re.compile(r"[0-9]+")
    pat_ws = re.compile(r"\s+")

    @F.pandas_udf(StringType())
    def norm_pandas(s: pd.Series) -> pd.Series:
        return (
            s.str.lower()
            .str.replace(pat_num, "#", regex=True)
            .str.replace(pat_ws, " ", regex=True)
            .str.strip()
        )

    def n_arrow():
        return norm_checksum(docs.select(norm_pandas("t").alias("n")))

    def _norm_one(x):
        return pat_ws.sub(" ", pat_num.sub("#", x.lower())).strip()

    norm_row = F.udf(_norm_one, StringType())

    def n_row():
        return norm_checksum(docs.select(norm_row("t").alias("n")))

    # warm-up pass each (plan compile, Python worker spin-up)
    builtin(), arrow(), row_udf()
    t_b, v_b = timed(builtin)
    t_a, v_a = timed(arrow)
    t_r, v_r = timed(row_udf)
    assert v_b == v_a == v_r, (v_b, v_a, v_r)

    n_builtin(), n_arrow(), n_row()
    t_nb, v_nb = timed(n_builtin)
    t_na, v_na = timed(n_arrow)
    t_nr, v_nr = timed(n_row)
    assert v_nb == v_na == v_nr, (v_nb, v_na, v_nr)

    n = li.count()
    print(
        json.dumps(
            {
                "metric": "udf_cost",
                "sf": SF_DIR,
                "rows": n,
                "md5": {
                    "builtin_sec": round(t_b, 3),
                    "pandas_udf_sec": round(t_a, 3),
                    "python_udf_sec": round(t_r, 3),
                    "pandas_vs_builtin": round(t_a / t_b, 2),
                    "python_vs_builtin": round(t_r / t_b, 2),
                },
                "normalize_chain": {
                    "builtin_sec": round(t_nb, 3),
                    "pandas_udf_sec": round(t_na, 3),
                    "python_udf_sec": round(t_nr, 3),
                    "pandas_vs_builtin": round(t_na / t_nb, 2),
                    "python_vs_builtin": round(t_nr / t_nb, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
