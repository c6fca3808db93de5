"""Arrow IPC (Feather v2) files as a Spark Python DataSource.

Arrow IPC is the ML world's interchange format — HuggingFace datasets
materialize as Arrow files, feature stores hand off record batches,
and pandas/polars/duckdb all read it zero-copy — so a training-data
engine needs a first-class scan, not a pandas pre-step. Built on
pyarrow (in this container; Arrow is already Spark's Python transfer
layer):

- ``spark.read.format("arrowipc").load(dir)`` — one input partition
  per ``.arrow`` file (the natural split: the IPC footer indexes
  record batches per file), schema INFERRED from the first file's
  Arrow schema (int/float/string/binary/bool/date/timestamp mapped to
  Spark DDL), rows streamed batch-by-batch through Arrow without a
  pandas detour.
- ``df.write.format("arrowipc").save(dir)`` — shard-per-partition
  ``.arrow`` export with the same two-phase commit discipline as the
  WARC writer (tasks stage ``.inprogress`` files, the driver commit
  renames) — a speculative or failed task never publishes.

Scale: file-level parallelism like every file source here; record
batches decode columnar-to-columnar (pyarrow → Arrow batch → Spark),
so the per-row Python cost is tuple assembly only. Honest failure:
non-IPC bytes raise ``ValueError`` with the reason.

Reference behavior modeled: none (SURVEY §2 'File formats: none');
training-data-pipeline extension surface.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

#: Spark DDL simpleString → pyarrow factory, for the WRITER's explicit
#: schema (inferring types from Python values per partition would let
#: an all-NULL column infer Arrow 'null' and shards drift — the writer
#: must emit the DECLARED schema on every shard).
def _pa_type_of(spark_type):
    import pyarrow as pa

    name = spark_type.simpleString()
    table = {
        "tinyint": pa.int8(), "smallint": pa.int16(), "int": pa.int32(),
        "bigint": pa.int64(), "float": pa.float32(), "double": pa.float64(),
        "string": pa.string(), "binary": pa.binary(),
        "boolean": pa.bool_(), "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if name in table:
        return table[name]
    if name.startswith("decimal("):
        p, sc = name[8:-1].split(",")
        return pa.decimal128(int(p), int(sc))
    raise ValueError(f"unsupported Spark type {name!r} for the arrow sink")


_ARROW_TO_DDL = {
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "bigint",
    "uint8": "smallint", "uint16": "int", "uint32": "bigint",
    "float": "float", "double": "double",
    "string": "string", "large_string": "string",
    "binary": "binary", "large_binary": "binary",
    "bool": "boolean", "date32[day]": "date",
}


def _ddl_of(schema) -> str:
    parts = []
    for field in schema:
        t = str(field.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t.startswith("decimal"):
            ddl = t  # decimal(p, s) spells the same in Spark DDL
        else:
            ddl = _ARROW_TO_DDL.get(t)
        if ddl is None:
            raise ValueError(f"unsupported Arrow type {t!r} for {field.name}")
        parts.append(f"{field.name} {ddl}")
    return ", ".join(parts)


def _list_arrow_files(d: str) -> list[str]:
    files = sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith((".arrow", ".feather"))
    )
    if not files:
        raise ValueError(f"no .arrow/.feather files under {d}")
    return files


def _make_datasource_class():
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    class _ArrowReader(DataSourceReader):
        def __init__(self, options, schema):
            self._dir = options.get("path")
            if not self._dir:
                raise ValueError("arrowipc source requires a path")
            self._fields = [f.name for f in schema.fields]

        def partitions(self):
            return [InputPartition(p) for p in _list_arrow_files(self._dir)]

        def read(self, partition):
            import pyarrow as pa

            try:
                with pa.memory_map(partition.value, "r") as mm:
                    reader = pa.ipc.open_file(mm)
                    for i in range(reader.num_record_batches):
                        batch = reader.get_batch(i)
                        cols = [batch.column(f).to_pylist() for f in self._fields]
                        yield from zip(*cols)
            except pa.ArrowInvalid as exc:
                raise ValueError(f"corrupt Arrow IPC file: {exc}") from exc

    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class _ArrowStreamReader(SimpleDataSourceStreamReader):
        """Landing-zone streaming (the WARC r5 recipe, VERDICT r6 item
        6): each micro-batch ingests the .arrow files that appeared
        since the last offset. The offset is the sorted list of consumed
        file names — replayable (exactly-once with a checkpoint:
        readBetweenOffsets re-yields any batch from its two offsets),
        monotone, and human-auditable. Schema comes from the batch
        files themselves and must match the stream's (inferred at
        start) — drifting shards raise rather than silently reshape."""

        def __init__(self, options, schema):
            self._dir = options.get("path")
            if not self._dir:
                raise ValueError("arrowipc stream source requires a path")
            self._fields = [f.name for f in schema.fields]

        def _list(self):
            return sorted(
                f
                for f in os.listdir(self._dir)
                if f.endswith((".arrow", ".feather"))
            )

        def _rows(self, names):
            import pyarrow as pa

            for base in names:
                path = os.path.join(self._dir, base)
                try:
                    with pa.memory_map(path, "r") as mm:
                        reader = pa.ipc.open_file(mm)
                        for i in range(reader.num_record_batches):
                            batch = reader.get_batch(i)
                            cols = [
                                batch.column(f).to_pylist() for f in self._fields
                            ]
                            yield from zip(*cols)
                except pa.ArrowInvalid as exc:
                    raise ValueError(f"corrupt Arrow IPC file: {exc}") from exc

        def initialOffset(self) -> dict:
            return {"seen": []}

        def read(self, start: dict):
            seen = set(start.get("seen", []))
            fresh = [f for f in self._list() if f not in seen]
            end = {"seen": sorted(seen | set(fresh))}
            # list_iterator, not a generator: Spark pickles the batch
            # for replay and generators don't pickle (see warc.py)
            return iter(list(self._rows(fresh))), end

        def readBetweenOffsets(self, start: dict, end: dict):
            fresh = sorted(
                set(end.get("seen", [])) - set(start.get("seen", []))
            )
            return iter(list(self._rows(fresh)))

    @dataclass
    class _ArrowCommit(WriterCommitMessage):
        final_name: str | None
        staged_path: str | None

    class _ArrowWriter(DataSourceWriter):
        def __init__(self, options, schema, overwrite):
            self._dir = options.get("path")
            if not self._dir:
                raise ValueError("arrowipc sink requires a path")
            self._overwrite = overwrite
            self._names = [f.name for f in schema.fields]
            # (name, pa.type) pairs resolved up front so an unsupported
            # type fails at write-plan time, not inside a task
            self._types = [
                (f.name, _pa_type_of(f.dataType)) for f in schema.fields
            ]

        def write(self, iterator):
            import uuid as _uuid

            import pyarrow as pa
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            rows = [tuple(r) for r in iterator]
            if not rows:
                return _ArrowCommit(None, None)
            cols = list(zip(*rows))
            schema = pa.schema(self._types)
            table = pa.table(
                {n: pa.array(list(c), type=t) for (n, t), c in zip(self._types, cols)},
                schema=schema,
            )
            # uuid in the FINAL name: append onto a directory written by
            # a previous job must add shards, never replace same-pid ones
            final = f"part-{pid:05d}-{_uuid.uuid4().hex[:8]}.arrow"
            staged = os.path.join(self._dir, f".{final}.inprogress")
            os.makedirs(self._dir, exist_ok=True)
            with pa.OSFile(staged, "wb") as sink:
                with pa.ipc.new_file(sink, table.schema) as writer:
                    writer.write_table(table)
            return _ArrowCommit(final, staged)

        def commit(self, messages):
            if self._overwrite:
                for f in os.listdir(self._dir):
                    if f.endswith((".arrow", ".feather")):
                        os.remove(os.path.join(self._dir, f))
            for m in messages:
                if m.final_name:
                    os.replace(
                        m.staged_path, os.path.join(self._dir, m.final_name)
                    )

        def abort(self, messages):
            for m in messages:
                if m.staged_path and os.path.exists(m.staged_path):
                    os.remove(m.staged_path)

    class ArrowIpcDataSource(DataSource):
        """Arrow IPC (Feather v2) scan/sink; schema inferred from the
        first file's Arrow schema on read."""

        @classmethod
        def name(cls) -> str:
            return "arrowipc"

        def schema(self) -> str:
            import pyarrow as pa

            d = self.options.get("path")
            if not d:
                raise ValueError("arrowipc source requires a path")
            first = _list_arrow_files(d)[0]
            with pa.memory_map(first, "r") as mm:
                return _ddl_of(pa.ipc.open_file(mm).schema)

        def reader(self, schema):
            return _ArrowReader(self.options, schema)

        def simpleStreamReader(self, schema):
            return _ArrowStreamReader(self.options, schema)

        def writer(self, schema, overwrite):
            return _ArrowWriter(self.options, schema, overwrite)

    return ArrowIpcDataSource


def register_arrowipc_source(spark: SparkSession) -> None:
    """Idempotently register the 'arrowipc' format on this session."""
    spark.dataSource.register(_make_datasource_class())


# ---------------------------------------------------------------------------
# Oracle-gated round trip over a planted Arrow fixture
# ---------------------------------------------------------------------------


def _fixture_dir(sf_dir: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"arrow_fix_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )


_N_FILES = 4
_ROWS_PER_FILE = 120
_BATCHES_PER_FILE = 3


def plant_arrow_fixtures(sf_dir: str) -> str:
    """``_N_FILES`` deterministic .arrow files, each with
    ``_BATCHES_PER_FILE`` record batches (multi-batch files are the
    HuggingFace layout; a reader that only sees batch 0 loses rows)."""
    import pyarrow as pa

    d = _fixture_dir(sf_dir)
    marker = os.path.join(d, "_PLANTED")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    per_batch = _ROWS_PER_FILE // _BATCHES_PER_FILE
    for f in range(_N_FILES):
        schema = pa.schema(
            [
                ("row_id", pa.int64()),
                ("label", pa.string()),
                ("score", pa.int64()),
            ]
        )
        path = os.path.join(d, f"shard-{f:04d}.arrow")
        with pa.OSFile(path, "wb") as sink:
            with pa.ipc.new_file(sink, schema) as writer:
                for b in range(_BATCHES_PER_FILE):
                    base = f * _ROWS_PER_FILE + b * per_batch
                    ids = list(range(base, base + per_batch))
                    writer.write_batch(
                        pa.record_batch(
                            [
                                pa.array(ids, pa.int64()),
                                pa.array([f"L{(i * 7) % 5}" for i in ids]),
                                pa.array([(i * 31) % 997 for i in ids], pa.int64()),
                            ],
                            schema=schema,
                        )
                    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return d


@register(
    "arrow_ipc_ingest_stats",
    oracle=f"""
    WITH rows_ AS (
        SELECT i AS row_id,
               'L' || CAST((i * 7) % 5 AS VARCHAR) AS label,
               (i * 31) % 997 AS score
        FROM range(0, {_N_FILES * _ROWS_PER_FILE}) t(i)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(score) AS BIGINT) AS score_sum,
           CAST(SUM(row_id) AS BIGINT) AS id_sum
    FROM rows_
    GROUP BY 1
    """,
    doc="Arrow IPC (Feather v2) ingestion through a Spark 4 Python "
    "DataSource: planted multi-record-batch .arrow shards (the "
    "HuggingFace dataset layout) scan with one partition per file and "
    "an INFERRED schema; per-label counts and position-weighted sums "
    "must match the arithmetic oracle — a lost record batch, schema "
    "drift, or row-order corruption hash-mismatches.",
)
def arrow_ipc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one task per .arrow shard (the IPC footer indexes batches
    within a file, so finer splits are possible the same way the WARC
    CDX index does it — file grain is the 100 TB default); columnar
    batches stream through without a pandas detour."""
    register_arrowipc_source(spark)
    d = plant_arrow_fixtures(sf_dir)
    df = spark.read.format("arrowipc").load(d)
    return df.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("score").cast("long").alias("score_sum"),
        F.sum("row_id").cast("long").alias("id_sum"),
    )
