"""Format-agnostic sources & sinks beyond the test parquet (O1/O2).

The reference reads only SQL Server tables; a Spark-native engine needs the
file-format surface: parquet (default), ORC, CSV, JSON, with explicit
schemas (never inferSchema in production paths), plus the month-partitioned
fact layout that makes the reference's incremental windows prune at 100 TB.
"""

from etl_loading_scripts_spark.sources.io import (
    ingest_jsonl_quarantined,
    read_table,
    write_bucketed,
    write_fact_partitioned,
    write_table,
)

__all__ = [
    "ingest_jsonl_quarantined",
    "read_table",
    "write_bucketed",
    "write_fact_partitioned",
    "write_table",
]
