"""Session-independence of the catalog (VERDICT r1 item 1).

The events table is stored as parquet TIMESTAMP(NANOS), which Spark
rejects (PARQUET_TYPE_ILLEGAL) unless ``spark.sql.legacy.parquet.
nanosAsLong`` is on. The driver builds its own vanilla SparkSession, so
``load_table`` must enable the conf at read time rather than relying on
``session.get_spark`` having preset it.
"""

from __future__ import annotations

import pytest

from etl_loading_scripts_spark.catalog import (
    _nanos_timestamp_columns,
    load_table,
    table_path,
)

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture
def vanilla_conf(spark):
    """Simulate the driver's session: the nanos conf is NOT preset."""
    had = spark.conf.get(NANOS_CONF, None)
    spark.conf.unset(NANOS_CONF)
    yield spark
    if had is not None:
        spark.conf.set(NANOS_CONF, had)


def test_events_nanos_probe_matches_file(sf_dir):
    """The probe reports exactly the TIMESTAMP(NANOS) columns the file
    stores. The driver has shipped events as both nanos and micros across
    rounds, so assert against the actual footer rather than hard-coding."""
    import pyarrow as pa
    import pyarrow.dataset as ds

    path = table_path(sf_dir, "events")
    schema = ds.dataset(path, format="parquet").schema
    expected = [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]
    assert _nanos_timestamp_columns(path) == expected


def test_non_events_tables_have_no_nanos(sf_dir):
    assert _nanos_timestamp_columns(table_path(sf_dir, "orders")) == []


def test_load_events_without_preset_conf(vanilla_conf, sf_dir):
    df = load_table(vanilla_conf, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_load_events_sets_conf_at_read_time(vanilla_conf, sf_dir):
    """When (and only when) the file stores nanos, the conf is enabled
    just-in-time; a micros file must load without touching it."""
    has_nanos = bool(_nanos_timestamp_columns(table_path(sf_dir, "events")))
    load_table(vanilla_conf, sf_dir, "events")
    if has_nanos:
        assert vanilla_conf.conf.get(NANOS_CONF) == "true"
    else:
        assert vanilla_conf.conf.get(NANOS_CONF, None) is None
