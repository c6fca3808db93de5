"""Unit tests for CDC changelog compaction and application.

Invariants: latest-(seq) op wins per key; a delete followed by a later
upsert resurrects the key; NULL keys are matched null-safely (one NULL
key, not a ghost per run — same contract as ``insert_if_absent``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_loading_scripts_spark.operators.cdc import (
    apply_changelog,
    compact_changelog,
)


def _rows(df, *cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((x is not None, x) for x in t),
    )


def _log(spark, rows):
    return spark.createDataFrame(rows, ["uid", "seq", "op", "val"])


def test_compact_keeps_latest_per_key(spark):
    log = _log(spark, [(1, 1, "U", 10.0), (1, 3, "D", None), (1, 2, "U", 20.0)])
    out = compact_changelog(log, ["uid"], ["seq"])
    assert _rows(out, "uid", "seq", "op") == [(1, 3, "D")]


def test_apply_upsert_delete_and_resurrection(spark):
    target = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], ["k", "v"])
    log = _log(
        spark,
        [
            (1, 1, "D", None),  # delete 1 ...
            (1, 2, "U", 9.0),  # ... then resurrect with 9.0 (later seq wins)
            (2, 5, "D", None),  # delete 2
            (4, 1, "U", 4.0),  # brand-new key
        ],
    )
    out = apply_changelog(
        target,
        log,
        key={"k": "uid"},
        op_col="op",
        seq=["seq"],
        set_cols={"v": F.col("val")},
    )
    assert _rows(out, "k", "v", "action") == [
        (1, 9.0, "updated"),
        (3, 3.0, "kept"),
        (4, 4.0, "inserted"),
    ]


def test_apply_null_key_is_nullsafe(spark):
    target = spark.createDataFrame(
        [(None, 0.0), (1, 1.0)], "k bigint, v double"
    )
    log = spark.createDataFrame(
        [(None, 1, "U", 7.0)], "uid bigint, seq bigint, op string, val double"
    )
    out = apply_changelog(
        target,
        log,
        key={"k": "uid"},
        op_col="op",
        seq=["seq"],
        set_cols={"v": F.col("val")},
    )
    # NULL key null-safe-matches the NULL-keyed target row: updated in
    # place, no ghost insert.
    assert _rows(out, "k", "v", "action") == [
        (None, 7.0, "updated"),
        (1, 1.0, "kept"),
    ]
