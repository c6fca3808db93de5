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
from functools import lru_cache

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


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — detected from the
    file footer (pyarrow, metadata-only read), so the decision does not
    depend on how the current SparkSession was configured.

    Cached per (path, mtime): the probe is a pure function of the file, and
    uncached it bills every load_table call a footer round-trip (~0.1 s of
    fixed overhead per query on the events family; on object stores it
    would be a remote HEAD+range read)."""
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    return _nanos_probe_cached(path, mtime)


@lru_cache(maxsize=256)
def _nanos_probe_cached(path: str, _mtime_ns: int) -> list[str]:
    try:
        import pyarrow as pa
        import pyarrow.dataset as ds

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def _normalize_nanos(df: DataFrame, nanos_cols: list[str]) -> DataFrame:
    """Normalize event-time columns to UTC microsecond ``TimestampType``
    regardless of how the parquet writer typed them — the driver has
    shipped ``events.ts`` as TIMESTAMP(NANOS) and as TIMESTAMP(MICROS)
    isAdjustedToUTC=false across rounds:

    - TIMESTAMP(NANOS) arrives as long under
      ``spark.sql.legacy.parquet.nanosAsLong``; integer-divide to micros
      (same truncation DuckDB applies reading the file);
    - TIMESTAMP(MICROS) without UTC adjustment arrives as
      ``TimestampNTZType``; with the session zone pinned UTC
      (:func:`_pin_session_semantics`), a plain cast reinterprets the
      same wall clock as the same instant — bit-identical to what DuckDB
      computes on the naive value.

    Works identically on batch and ``readStream`` DataFrames.
    """
    from pyspark.sql import functions as F

    out = df
    for f in df.schema.fields:
        kind = f.dataType.simpleString()
        if f.name in nanos_cols and kind == "bigint":
            # integer division: float division of ~1e18 nanos loses precision
            out = out.withColumn(
                f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000"))
            )
        elif kind == "timestamp_ntz":
            out = out.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return out


def _pin_session_semantics(spark: SparkSession) -> None:
    """Runtime-settable confs every registered query's semantics depend on,
    applied at read time so results are identical from ANY SparkSession
    (the driver contract runs queries in a session this engine didn't
    build — see VERDICT r1 item 1): timestamps are defined in UTC (the
    DuckDB oracle is UTC-naive; date_format outputs shift under any other
    session zone)."""
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def stream_source_schema(spark: SparkSession, path: str):
    """(read schema, nanos column names) for a parquet path used as a
    Structured Streaming file source. Enables ``nanosAsLong`` just-in-time
    so the schema probe (and the stream reads that follow) work from any
    session; callers pass the nanos columns to :func:`_normalize_nanos`."""
    _pin_session_semantics(spark)
    nanos_cols = _nanos_timestamp_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).schema, nanos_cols


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table. Parquet → full pushdown/pruning.

    Works from ANY SparkSession: if the file stores TIMESTAMP(NANOS)
    (Spark cannot read it natively — PARQUET_TYPE_ILLEGAL), the
    runtime-settable SQL conf ``spark.sql.legacy.parquet.nanosAsLong`` is
    enabled just-in-time so the column arrives as bigint, then converted
    to microsecond TimestampType; the session timezone is likewise pinned
    UTC at read time.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _pin_session_semantics(spark)
    path = table_path(sf_dir, name)
    nanos_cols = _nanos_timestamp_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return _normalize_nanos(df, nanos_cols)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle setup)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
