"""Deterministic GOLDEN Delta-table generator (round 8, VERDICT item 5).

Produces a small, byte-stable ``_delta_log`` (pinned uuids, pinned
clock, pinned shuffle layout) plus its data/change parquet, exercising
every action the writer emits: protocol, metaData (partitioned), add
with partitionValues + stats, remove, cdc. The COMMITTED copy at
``tests/fixtures/golden_delta`` is the standing adjudication artifact:
the day delta-spark or duckdb-delta becomes installable in some
environment, pointing it at this directory settles interop in minutes
(BASELINE.md records the recurring install probe). Until then,
``tests/test_delta_golden.py`` asserts (a) the engine still READS the
committed bytes exactly, and (b) the writer still EMITS the same
actions (regenerate-and-compare, volatile fields masked).

Run ``python tests/_golden_delta_gen.py`` to (re)generate the
committed fixture after an intentional format change.
"""

from __future__ import annotations

import itertools
import os
import shutil

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden_delta")

#: pinned clock: 2023-11-14T22:13:20Z, a fixed instant
PINNED_TIME = 1_700_000_000.0


class _FakeUUID:
    def __init__(self, n: int):
        self.hex = f"{n:032x}"


def generate(spark, dest: str) -> None:
    """Build the golden table at ``dest`` deterministically: pinned
    uuid sequence, pinned clock, fixed shuffle layout (AQE off,
    2 shuffle partitions), sorted file walks (already the writer's
    behavior). Byte-stable across runs on one Spark version; only
    parquet-internal bytes (and hence add.size) may drift across Spark
    versions — the compare in test_delta_golden masks exactly those."""
    from etl_loading_scripts_spark.operators import deltalog as dl

    counter = itertools.count()
    real_uuid4 = dl.uuid.uuid4
    real_time = dl.time.time
    conf = spark.conf
    old_parts = conf.get("spark.sql.shuffle.partitions")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    dl.uuid.uuid4 = lambda: _FakeUUID(next(counter))
    dl.time.time = lambda: PINNED_TIME
    conf.set("spark.sql.shuffle.partitions", "2")
    conf.set("spark.sql.adaptive.enabled", "false")
    try:
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        df = spark.createDataFrame(
            [(1, 10, 1), (2, 20, 1), (3, 30, 2), (4, 40, 2)],
            "k int, v int, m int",
        ).coalesce(1)
        dl.write_delta_table(df, dest, partition_by=["m"])
        src = spark.createDataFrame(
            [(2, 99, 1), (5, 50, 2)], "k int, v int, m int"
        )
        dl.merge_upsert_deltalog(spark, dest, src, on=["k"])
        # v2 (round 9): a deletion-vector DELETE — pins the add action's
        # deletionVector shape and the _deletion_vectors/ sidecar bytes
        dl.delete_delta(spark, dest, "k = 3", deletion_vectors=True)
    finally:
        dl.uuid.uuid4 = real_uuid4
        dl.time.time = real_time
        conf.set("spark.sql.shuffle.partitions", old_parts)
        conf.set("spark.sql.adaptive.enabled", old_aqe)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from etl_loading_scripts_spark.session import get_spark

    generate(get_spark(), GOLDEN_DIR)
    for root, _dirs, files in sorted(os.walk(GOLDEN_DIR)):
        for f in sorted(files):
            print(os.path.relpath(os.path.join(root, f), GOLDEN_DIR))
