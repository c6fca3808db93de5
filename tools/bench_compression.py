#!/usr/bin/env python
"""Parquet codec trade-off on the fact table (round 5): storage bytes
vs scan wall-clock for snappy / zstd / gzip / none — the 100 TB
storage-cost decision measured, not quoted."""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_loading_scripts_spark.catalog import load_table  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="bench_compression")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, SF_DIR, "lineitem")
    out = {}
    for codec in ("none", "snappy", "zstd", "gzip"):
        d = os.path.join(tempfile.gettempdir(), f"comp_{codec}")
        t0 = time.time()
        li.write.mode("overwrite").option("compression", codec).parquet(d)
        t_write = time.time() - t0
        size = sum(
            os.path.getsize(f) for f in glob.glob(d + "/*.parquet")
        )
        # warm scan: full aggregate over all columns' heaviest pair
        best = None
        for _ in range(3):
            t0 = time.time()
            spark.read.parquet(d).agg(
                F.sum("l_extendedprice"), F.sum("l_quantity"), F.count("*")
            ).collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[codec] = {
            "bytes": size, "write_s": round(t_write, 2),
            "scan_s": round(best, 3),
        }
        print(f"# {codec}: {out[codec]}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "codecs": out}))


if __name__ == "__main__":
    main()
