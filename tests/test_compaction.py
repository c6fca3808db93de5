"""Small-file compaction: physical-layout proofs the hash oracle can't see.

Contract (operators/compaction.py): bin-pack fragmented partitions to
~target-size files, change zero rows, skip partitions already laid out
well (byte-identical), split whale partitions instead of producing one
giant file, and commit through the COW two-phase sweep.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_loading_scripts_spark.operators.compaction import compact_partition_files
from etl_loading_scripts_spark.operators.cow import list_partition_files
from etl_loading_scripts_spark.sources.io import write_fact_partitioned


def _seed_fragmented(spark, path: str, rows_per_month: int = 300):
    rows = [
        (m * 1000 + i, 20240000 + m * 100 + 1 + i % 28, float(i))
        for m in (1, 2, 3)
        for i in range(rows_per_month)
    ]
    df = spark.createDataFrame(rows, "k BIGINT, datekey INT, amount DOUBLE")
    # 8 writer tasks per month -> 8 files per partition
    write_fact_partitioned(df.repartition(8, "k"), path, compact=False)
    return df


def test_compaction_merges_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "fact")
    df = _seed_fragmented(spark, path)
    before = list_partition_files(spark, path)
    assert all(len(files) == 8 for files in before.values())
    rows_before = {
        (r.k, r.datekey, r.amount) for r in spark.read.parquet(path).collect()
    }

    stats = compact_partition_files(spark, path)
    assert sorted(stats["months_compacted"]) == [202401, 202402, 202403]
    assert stats["files_before"] == 24
    after = list_partition_files(spark, path)
    assert all(len(files) == 1 for files in after.values())
    assert stats["files_after"] == 3
    rows_after = {
        (r.k, r.datekey, r.amount) for r in spark.read.parquet(path).collect()
    }
    assert rows_after == rows_before  # zero rows changed


def test_compaction_skips_already_compact_months(spark, tmp_path):
    """Second run: everything is at target layout -> all skipped, every
    file byte-identical (compaction must not churn good layout)."""
    path = str(tmp_path / "fact")
    _seed_fragmented(spark, path)
    compact_partition_files(spark, path)
    before = list_partition_files(spark, path)

    stats = compact_partition_files(spark, path)
    assert stats["months_compacted"] == []
    assert sorted(stats["months_skipped"]) == [202401, 202402, 202403]
    assert list_partition_files(spark, path) == before


def test_compaction_scoped_months_leave_others_untouched(spark, tmp_path):
    path = str(tmp_path / "fact")
    _seed_fragmented(spark, path)
    before = list_partition_files(spark, path)

    stats = compact_partition_files(spark, path, months=[202402])
    assert stats["months_compacted"] == [202402]
    after = list_partition_files(spark, path)
    assert after[202401] == before[202401]
    assert after[202403] == before[202403]
    assert len(after[202402]) == 1


def test_compaction_splits_whale_months(spark, tmp_path):
    """A tiny target_bytes forces a month to SPLIT into several
    target-size files rather than one giant file."""
    path = str(tmp_path / "fact")
    _seed_fragmented(spark, path, rows_per_month=2000)
    total = sum(
        sz for files in list_partition_files(spark, path).values()
        for (_, sz, _) in files
    )
    target = total // 12  # aim for ~4 files per month
    stats = compact_partition_files(spark, path, target_bytes=target)
    after = list_partition_files(spark, path)
    assert stats["months_compacted"], stats
    for m in stats["months_compacted"]:
        assert 2 <= len(after[m]) <= 8
    n = spark.read.parquet(path).count()
    assert n == 6000
