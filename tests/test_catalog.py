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


def test_events_detected_as_nanos(sf_dir):
    assert _nanos_timestamp_columns(table_path(sf_dir, "events")) == ["ts"]


def test_non_events_tables_have_no_nanos(sf_dir):
    assert _nanos_timestamp_columns(table_path(sf_dir, "orders")) == []


def test_load_events_without_preset_conf(vanilla_conf, sf_dir):
    df = load_table(vanilla_conf, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_load_events_sets_conf_at_read_time(vanilla_conf, sf_dir):
    load_table(vanilla_conf, sf_dir, "events")
    assert vanilla_conf.conf.get(NANOS_CONF) == "true"
