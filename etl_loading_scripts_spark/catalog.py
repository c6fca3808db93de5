"""Table catalog: loaders for the driver's synthetic star schema.

The reference reads SQL Server tables across two linked servers
(SURVEY §1.1, O1); here a "table" is a parquet path under a scale-factor
directory and a "linked server" is just another path — one catalog.

At 100 TB the fact tables (lineitem/orders/events) would be written
partitioned by a date prefix (``datekey`` month) so the monthly incremental
reads prune to ~1 partition (SURVEY §4 "incremental windows"); the loaders
below read whatever layout is present and rely on Catalyst for filter
pushdown + column pruning into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimensions safe to broadcast at any production scale (SURVEY §4:
#: "dims unpartitioned (broadcast)"). customer/supplier/part grow with SF but
#: stay dimension-sized; region/nation are constant.
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns arrive as long (see session config
    ``spark.sql.legacy.parquet.nanosAsLong``); convert to microsecond
    TimestampType — same truncation DuckDB applies reading the file."""
    from pyspark.sql import functions as F

    out = df
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer division: float division of ~1e18 nanos loses precision
            out = out.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table. Parquet → full pushdown/pruning."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    return _normalize_nanos(df) if name == "events" else df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle setup)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
