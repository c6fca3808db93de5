"""Small-file compaction for the month-partitioned parquet layout —
the ``OPTIMIZE`` / bin-packing half of lakehouse table maintenance.

Why it exists: streaming sinks, frequent small merges, and high
write-parallelism leave partitions holding many kilobyte-scale files;
at 100 TB the file-listing and per-file open/footer costs dominate scan
time long before data volume does (the round-3 SCALING.md small-files
measurement quantified the read penalty). Delta/Iceberg ship this as
``OPTIMIZE``/``rewrite_data_files``; absent those (environment blocker,
BASELINE.md), this module implements the same contract on plain
hive-partitioned parquet, reusing the COW two-phase commit so a crash
mid-compaction never loses a partition (``operators/cow.py``).

Mechanics: for each affected month the target file count is
``ceil(partition_bytes / target_bytes)``; months already at or under
that count are SKIPPED (their files stay byte-identical — compaction
must never churn data that is already laid out well). Rewritten months
are read, shuffled one-month-per-task (`repartition` on the partition
column), and written with ``maxRecordsPerFile`` derived from the
observed average row width, so a whale month splits into ~target-size
files instead of one giant one. Commit is the same
rename-aside / rename-in / delete-old sweep as the COW merge, with
``recover_cow_commit`` run first.

Scale notes: listing is metadata-only (no data read) and the decision
is per-partition, so a nightly compactor scans only partitions whose
file count drifted; the rewrite cost is exactly the bytes of the
fragmented partitions. Compaction changes NO rows — the registered
query's DuckDB oracle proves that, and the byte audit in
``tests/test_compaction.py`` proves well-laid-out months are untouched.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.operators.cow import (
    MONTH_COL,
    _STAGING,
    _commit_staged_months,
    list_partition_files,
    recover_cow_commit,
)


def compact_partition_files(
    spark: SparkSession,
    table_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    months: Sequence[int] | None = None,
) -> dict:
    """Bin-pack each month's data files toward ``target_bytes`` apiece.

    Returns ``{"months_compacted": [...], "months_skipped": [...],
    "files_before": n, "files_after": n}`` where the file counts cover
    the compacted months only. Skipped months are untouched on disk.
    """
    recover_cow_commit(spark, table_path)
    listing = list_partition_files(spark, table_path, months)
    plan: dict[int, tuple[int, int]] = {}
    skipped: list[int] = []
    for m, files in sorted(listing.items()):
        total = sum(sz for (_, sz, _) in files)
        want = max(1, math.ceil(total / target_bytes))
        if len(files) <= want:
            skipped.append(m)
        else:
            plan[m] = (len(files), total)
    if not plan:
        return {
            "months_compacted": [],
            "months_skipped": skipped,
            "files_before": 0,
            "files_after": 0,
        }

    affected = sorted(plan)
    scoped = spark.read.parquet(table_path).filter(
        F.col(MONTH_COL).isin(affected)
    )
    # rows-per-file cap from the OBSERVED average row width of the
    # months being rewritten (footer metadata count + listed bytes —
    # no data scan), so maxRecordsPerFile lands files near target_bytes.
    # r15 (guide §1.2, the count-elision playbook): the row count comes
    # from the parquet FOOTERS of exactly the files the rewrite reads
    # anyway — driver-side metadata, zero Spark jobs — instead of a
    # count() job over the scoped scan.
    import os as _os

    import pyarrow.parquet as _pq

    total_bytes = sum(b for (_, b) in plan.values())
    n_rows = sum(
        _pq.ParquetFile(
            _os.path.join(table_path, f"{MONTH_COL}={m}", fname)
        ).metadata.num_rows
        for m in affected
        for (fname, _sz, _mt) in listing[m]
    )
    avg_row = max(1.0, total_bytes / max(1, n_rows))
    max_records = max(1, int(target_bytes / avg_row))
    (
        scoped.repartition(F.col(MONTH_COL))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records)
        .partitionBy(MONTH_COL)
        .parquet(f"{table_path}/{_STAGING}")
    )
    rewritten, emptied = _commit_staged_months(spark, table_path, affected)
    assert not emptied, "compaction must never empty a partition"
    after = list_partition_files(spark, table_path, affected)
    return {
        "months_compacted": rewritten,
        "months_skipped": skipped,
        "files_before": sum(n for (n, _) in plan.values()),
        "files_after": sum(len(v) for v in after.values()),
    }
