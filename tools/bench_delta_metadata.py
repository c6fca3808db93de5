#!/usr/bin/env python
"""Delta metadata at 10^5-10^6 files: Spark-side vs driver-side path.

Plants a log with N synthetic add actions (the metadata shape of a
100 TB fact at ~1 GB/file: 96 months, per-file k stats), then times

  - snapshot + partition-pruned file listing, driver-side Python
    (_snapshot_state walk) vs Spark (_pruned_files_spark),
  - checkpoint write, pyarrow driver-side vs Spark distributed,
  - post-expiry pruned listing through the checkpoint, both paths.

Usage: python tools/bench_delta_metadata.py [N_FILES ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_loading_scripts_spark.operators import deltalog as dl  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402


def plant(spark, d: str, n: int) -> None:
    base = spark.range(8).select(
        F.col("id").alias("k"),
        F.lit(190001).alias("month"),
        F.col("id").alias("v"),
    )
    dl.write_delta_table(base, d, partition_by=["month"])
    actions = []
    for i in range(n):
        month = 202001 + (i % 96)
        lo = (i % 1000) * 1000
        actions.append(
            {
                "add": {
                    "path": f"month={month}/part-fake{i:07d}.parquet",
                    "partitionValues": {"month": str(month)},
                    "size": 1 << 30,
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": 1000,
                            "minValues": {"k": lo},
                            "maxValues": {"k": lo + 999},
                        }
                    ),
                }
            }
        )
    dl._commit(d, 1, actions)


def t(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def python_pruned(d: str, month: int) -> list[str]:
    active, _, _ = dl._snapshot_state(d, None)
    return sorted(
        p
        for p, a in active.items()
        if a.get("partitionValues", {}).get("month") == str(month)
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark()
    results = []
    for n in sizes:
        d = tempfile.mkdtemp(prefix="dmeta_") + "/t"
        plant(spark, d, n)
        r: dict = {"n_files": n}

        r["prune_python_s"], py_files = t(lambda: python_pruned(d, 202007))
        r["prune_spark_s"], sp_files = t(
            lambda: dl._pruned_files_spark(
                spark, d, None, ["month"], {"month": 202007}, None
            )
        )
        assert sp_files == py_files, "paths disagree"
        r["files_selected"] = len(sp_files)

        r["stats_prune_spark_s"], both = t(
            lambda: dl._pruned_files_spark(
                spark,
                d,
                None,
                ["month"],
                {"month": 202007},
                {"k": (500_000, 500_999)},
            )
        )
        r["files_after_stats"] = len(both)

        r["checkpoint_spark_s"], _ = t(
            lambda: dl.checkpoint_delta(d, spark=spark, spark_threshold=0)
        )
        if n <= 200_000:  # driver-side comparison point
            r["checkpoint_python_s"], _ = t(lambda: dl.checkpoint_delta(d))
        dl.expire_delta_log(d)
        r["prune_via_checkpoint_spark_s"], again = t(
            lambda: dl._pruned_files_spark(
                spark, d, None, ["month"], {"month": 202007}, None
            )
        )
        assert again == py_files
        results.append(r)
        print(json.dumps(r))
        shutil.rmtree(d.rsplit("/", 1)[0], ignore_errors=True)
    print(json.dumps({"metric": "delta_metadata_scale", "runs": results}))


if __name__ == "__main__":
    main()
