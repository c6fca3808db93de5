"""Delta Lake transaction log — the OPEN PROTOCOL, executable here.

The delta-spark JARs cannot be materialized in this environment
(BASELINE.md probe: no modules, no Ivy cache, Maven DNS unresolvable),
so `merge_upsert_delta` keeps its informative raise. But Delta the
FORMAT is an open specification (the delta-io PROTOCOL document): a
table is parquet data files plus a ``_delta_log/`` directory of JSON
action files — ``protocol`` / ``metaData`` / ``add`` / ``remove`` —
where each ``{version:020d}.json`` commit is made visible atomically by
a single file rename. Nothing about READING or WRITING that log needs
the library. This module implements the core protocol from scratch:

- :func:`write_delta_table` — create/overwrite/append, one atomic
  commit per call (staged-temp → ``os.rename``; a crash before the
  rename leaves invisible data files, never a torn table);
- :func:`read_delta_table` — snapshot reads with TIME TRAVEL
  (``version=``): replay actions up to the pinned version, read
  exactly that version's active files (snapshot isolation: a reader
  pinned at N never sees N+1's files);
- :func:`merge_upsert_deltalog` — the reference's MERGE semantics
  (``spScript.sql:95-202`` shape via ``operators.mutations.
  merge_upsert``) EXECUTED against the Delta format: compute the
  merged state, stage new data files, commit ``remove``+``add`` as one
  version. This closes the 'lakehouse-native MERGE never executed'
  gap at the level that matters — the open table format — while the
  library code path stays honestly gated;
- :func:`vacuum_delta` — retention GC of files no live version
  references.

Schema travels as Spark's schema JSON — which IS Delta's
``schemaString`` format. Interop caveat (same as every codec here):
tables round-trip through this module and follow the public protocol
document; cross-validation against delta-spark/duckdb-delta is not
possible in this offline environment.

Scale: the log is O(commits) driver-side metadata (the real protocol
adds parquet checkpoints every N commits — same recipe as
``sources/skipping.py``, documented seam); data-file IO is ordinary
partition-parallel parquet. Merge rewrites the full table here — the
partition-scoped rewrite for month-grain facts is ``operators/cow.py``'s
job and composes (stage that module's output files, commit them here).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 — callers' convenience
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def _versions(table: str) -> list[int]:
    d = _log_path(table)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5])
        for f in os.listdir(d)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def _read_actions(table: str, version: int) -> list[dict]:
    with open(os.path.join(_log_path(table), f"{version:020d}.json")) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _commit(table: str, version: int, actions: list[dict]) -> None:
    """One atomic commit: write every action as a JSON line to a temp
    file, then rename to ``{version:020d}.json``. The rename is the
    commit point — readers either see the whole version or none of it.
    An already-existing target means a concurrent writer won the
    version (optimistic concurrency): raise, caller retries on a fresh
    snapshot."""
    d = _log_path(table)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"{version:020d}.json")
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a, separators=(",", ":")) + "\n")
    try:
        # os.link FAILS with EEXIST when the version is taken — unlike
        # os.rename, which silently replaces and would let two truly
        # concurrent writers both "win" the same version (TOCTOU). The
        # link IS the atomic commit point, same role as the real
        # protocol's putIfAbsent.
        os.link(tmp, final)
    except FileExistsError as exc:
        raise RuntimeError(
            f"delta commit conflict: version {version} already committed"
        ) from exc
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _stage_data_files(df: DataFrame, table: str) -> list[dict]:
    """Write ``df`` as parquet into the table directory under fresh
    uuid names (staged via a temp subdir so a crash mid-write leaves
    no half-named files) and return their ``add`` actions. Files are
    INVISIBLE until a commit references them — the protocol's
    data/metadata split."""
    staging = os.path.join(table, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    adds = []
    now = int(time.time() * 1000)
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"part-{uuid.uuid4().hex}.parquet"
        src = os.path.join(staging, f)
        dst = os.path.join(table, name)
        size = os.path.getsize(src)
        os.rename(src, dst)
        adds.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": size,
                    "modificationTime": now,
                    "dataChange": True,
                }
            }
        )
    shutil.rmtree(staging, ignore_errors=True)
    if not adds:  # empty frame: still a valid commit (schema-only)
        return []
    return adds


def _snapshot_files(table: str, version: int | None) -> tuple[list[str], dict]:
    versions = _versions(table)
    if not versions:
        raise FileNotFoundError(f"not a delta table (no log): {table}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in log (have {versions})")
    active: dict[str, dict] = {}
    meta: dict = {}
    for v in versions:
        if v > version:
            break
        for a in _read_actions(table, v):
            if "metaData" in a:
                meta = a["metaData"]
            elif "add" in a:
                active[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                active.pop(a["remove"]["path"], None)
    if not meta:
        raise ValueError(f"corrupt delta log: no metaData by version {version}")
    return sorted(active), meta


def write_delta_table(
    df: DataFrame, table: str, mode: str = "overwrite"
) -> int:
    """Create (version 0: protocol + metaData), OVERWRITE (remove every
    active file + add the new ones) or APPEND (add only) in one atomic
    commit. Returns the committed version."""
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be overwrite|append")
    versions = _versions(table)
    version = (versions[-1] + 1) if versions else 0
    actions: list[dict] = []
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": int(time.time() * 1000),
                }
            }
        )
    elif mode == "overwrite":
        old_files, _ = _snapshot_files(table, None)
        now = int(time.time() * 1000)
        actions.extend(
            {"remove": {"path": p, "deletionTimestamp": now, "dataChange": True}}
            for p in old_files
        )
    actions.extend(_stage_data_files(df, table))
    _commit(table, version, actions)
    return version


def read_delta_table(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Snapshot read at ``version`` (default: latest). Time travel and
    snapshot isolation fall out of the log replay: the file list is
    fixed by the pinned version, so later commits can never leak into
    an open reader."""
    files, meta = _snapshot_files(table, version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(table, f) for f in files]
    )


def merge_upsert_deltalog(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    on: Sequence[str],
    delete_unmatched_source: bool = False,
    _pre_commit_hook=None,
    **merge_kwargs,
) -> int:
    """The reference's MERGE executed against the open Delta format:
    read the current snapshot, apply the join-based
    :func:`operators.mutations.merge_upsert` (same semantics object the
    oracle-checked `merge_full_sync` query exercises), stage the merged
    state as new files, and commit remove(old)+add(new) as ONE version
    — readers see the entire merge or none of it, and the pre-merge
    version stays time-travelable. Returns the committed version."""
    from etl_loading_scripts_spark.operators.mutations import merge_upsert

    # Pin ONE version listing up front and derive everything — the input
    # snapshot, the remove list, and the commit version — from it. A writer
    # committing after this listing lands on the same `pinned + 1` and the
    # putIfAbsent link collides, raising the conflict the retry loop needs.
    # (Re-listing before commit, as an earlier revision did, silently erased
    # any commit that interleaved between the snapshot read and the listing.)
    versions = _versions(table)
    if not versions:
        raise FileNotFoundError(f"not a delta table (no log): {table}")
    pinned = versions[-1]
    target = read_delta_table(spark, table, version=pinned)
    merged = merge_upsert(
        target, source, on,
        delete_unmatched_source=delete_unmatched_source, **merge_kwargs,
    )
    version = pinned + 1
    old_files, _ = _snapshot_files(table, pinned)
    now = int(time.time() * 1000)
    actions = [
        {"remove": {"path": p, "deletionTimestamp": now, "dataChange": True}}
        for p in old_files
    ]
    actions.extend(_stage_data_files(merged, table))
    if _pre_commit_hook is not None:  # test seam: inject a racing writer
        _pre_commit_hook()
    _commit(table, version, actions)
    return version


def merge_upsert_deltalog_with_retry(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    on: Sequence[str],
    max_retries: int = 3,
    **merge_kwargs,
) -> int:
    """Optimistic concurrency control around the merge: a commit
    conflict (another writer took the version between our snapshot read
    and our rename) re-reads the NEW snapshot and recomputes the merge —
    the losing writer's work is recomputed against the winner's state,
    exactly the semantics the real protocol's retry loop gives
    idempotent merges. Raises after ``max_retries`` genuine conflicts;
    every other error propagates immediately."""
    last: RuntimeError | None = None
    for _ in range(max_retries + 1):
        try:
            return merge_upsert_deltalog(spark, table, source, on, **merge_kwargs)
        except RuntimeError as exc:
            if "conflict" not in str(exc):
                raise
            last = exc
    raise RuntimeError(
        f"delta merge lost {max_retries + 1} optimistic-concurrency races"
    ) from last


def vacuum_delta(
    table: str, keep_versions: int = 2, staging_retention_sec: float = 3600
) -> list[str]:
    """Retention GC: delete data files referenced by NO version in the
    keep window (latest ``keep_versions`` versions stay fully
    time-travelable; older log entries remain but their exclusive files
    go). Staging dirs AND unreferenced .parquet in the table root are
    swept only past ``staging_retention_sec`` — a concurrent writer
    (mid-stage, or mid rename-to-commit) must never lose files to GC;
    pass 0 only when no writer can be live (the real protocol's
    disabled-retention-duration-check testing mode)."""
    versions = _versions(table)
    if not versions:
        return []
    keep = set(versions[-keep_versions:]) if keep_versions > 0 else set()
    needed: set[str] = set()
    for v in keep:
        files, _ = _snapshot_files(table, v)
        needed.update(files)
    removed = []
    now = time.time()
    for f in os.listdir(table):
        full = os.path.join(table, f)
        if f.startswith(".staging-") and os.path.isdir(full):
            # age-gate staging debris (the real protocol's retention
            # check): an in-flight concurrent writer's staging dir must
            # not be swept from under it — only abandoned ones
            if now - os.path.getmtime(full) < staging_retention_sec:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed.append(f)
        elif f.endswith(".parquet") and f not in needed:
            # Same retention gate as staging dirs: a concurrent writer
            # renames staged parts into the table root BEFORE its commit,
            # so a young unreferenced .parquet may be an imminent commit's
            # data — only files past the retention age are truly orphaned
            # (the real protocol's vacuum has the identical mtime check).
            if now - os.path.getmtime(full) < staging_retention_sec:
                continue
            os.remove(full)
            removed.append(f)
    return sorted(removed)


# --------------------------------------------------------------------------
# Oracle-gated merge + time travel over a planted Delta table
# --------------------------------------------------------------------------


def _fixture_dir(sf_dir: str) -> str:
    import hashlib
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"deltalog_fix_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )


def plant_delta_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Version 0: orders with key%5!=0 (amounts as exact cents).
    Version 1: MERGE of a source carrying every key%3==0 row at
    cents+100000 — updates where the key exists, inserts where it
    doesn't. Both versions stay readable (time travel)."""
    from etl_loading_scripts_spark.catalog import load_table

    d = _fixture_dir(sf_dir)
    if len(_versions(d)) >= 2:  # BOTH versions committed = complete
        return d
    if os.path.isdir(d):  # partial build (crash between v0 and the
        shutil.rmtree(d)  # merge): rebuild from scratch, never serve it
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("amount"),
    )
    base = orders.filter(F.col("k") % 5 != 0)
    write_delta_table(base, d, mode="overwrite")
    source = orders.filter(F.col("k") % 3 == 0).select(
        "k", (F.col("amount") + 1000).cast("decimal(18,4)").alias("amount")
    )
    merge_upsert_deltalog(spark, d, source, on=["k"])
    return d


from etl_loading_scripts_spark.registry import register  # noqa: E402


@register(
    "delta_log_merge_timetravel",
    oracle="""
    WITH amts AS (
        SELECT o_orderkey AS k,
               CAST(o_totalprice AS DECIMAL(18,4)) AS amount
        FROM orders
    ),
    v0 AS (
        SELECT 0 AS version,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(amount) AS DOUBLE) AS amount_sum
        FROM amts WHERE k % 5 <> 0
    ),
    v1 AS (
        SELECT 1 AS version,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(amount
                        + CASE WHEN k % 3 = 0 THEN 1000 ELSE 0 END)
                    AS DOUBLE) AS amount_sum
        FROM amts WHERE k % 5 <> 0 OR k % 3 = 0
    )
    SELECT * FROM v0 UNION ALL SELECT * FROM v1
    """,
    doc="Delta Lake MERGE + TIME TRAVEL executed against the open "
    "transaction-log protocol (operators/deltalog.py, from the public "
    "PROTOCOL document — the delta-spark jars stay environment-"
    "blocked): version 0 is the base table, version 1 a join-based "
    "MERGE (updates + inserts) committed as one atomic remove+add "
    "version; the query reads BOTH versions via log replay and their "
    "row counts + exact cent sums must match the arithmetic oracle — "
    "a torn commit, wrong snapshot, or merge bug mismatches.",
)
def delta_log_merge_timetravel(spark: SparkSession, sf_dir: str):
    """Scale: the log is O(commits) driver metadata; snapshot reads are
    ordinary parquet scans of exactly the pinned version's files. The
    merge rewrites table files (full-table grain here; month-grain COW
    composes via operators/cow.py staging + this module's commit)."""
    d = plant_delta_fixture(spark, sf_dir)
    out = None
    for v in (0, 1):
        snap = read_delta_table(spark, d, version=v)
        agg = snap.agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("amount").cast("double").alias("amount_sum"),
        ).select("version", "n_rows", "amount_sum")
        out = agg if out is None else out.unionByName(agg)
    return out
