"""Write/publish protocol: atomic-ish table swap (SURVEY §4.5, O2, O10).

The reference wraps multi-table syncs in a SQL transaction with rollback
(``spScript.sql(P-SF):20-22,345-357``). Spark has no cross-table
transactions; the equivalent discipline is **stage-all-then-publish**:
write every output to a ``_tmp`` location, then swap directories last, so a
mid-job failure leaves all current tables intact. With a Delta/Iceberg
catalog the swap becomes a real transaction — gated behind import-try since
those jars aren't in this image.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def truncate_insert(df: DataFrame, path: str) -> None:
    """Truncate-and-reload of a staging table (O2; ``S1:5``, ``P-PAT:30``).

    ``overwrite`` mode is Spark's truncate+insert. For partitioned fact
    tables use ``partition_by`` + dynamic overwrite so a monthly run
    replaces only its month.
    """
    df.write.mode("overwrite").parquet(path)


def publish_table(df: DataFrame, final_path: str) -> None:
    """Write to a temp dir, then atomically swap into place.

    Readers of ``final_path`` never observe a half-written table; a crash
    before the swap leaves the previous version intact (the reference's
    rollback semantics, per-table).

    The swap relies on ``os.rename`` being atomic — true on POSIX
    filesystems (this harness), NOT on object stores (S3/GCS rename is
    copy+delete). On a cluster over object storage, publish via a table
    format's atomic commit (Delta/Iceberg snapshot swap — see
    ``merge_upsert_delta``/``merge_upsert_iceberg``) or a metastore
    location flip instead.
    """
    tmp = f"{final_path}.__tmp__{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    backup = f"{final_path}.__old__"
    if os.path.exists(final_path):
        os.rename(final_path, backup)
    try:
        os.rename(tmp, final_path)
    except Exception:
        if os.path.exists(backup):
            os.rename(backup, final_path)
        raise
    finally:
        if os.path.exists(backup):
            shutil.rmtree(backup)


def referential_integrity_check(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> int:
    """Post-write FK assertion replacing the reference's constraint toggles
    (O11; ``P-SF:25-29``, ``P-RES:440``): count of dangling fact keys.
    Run after publish; a non-zero result fails the pipeline run."""
    from pyspark.sql import functions as F

    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    dangling = (
        fact.select(fact_key)
        .filter(F.col(fact_key).isNotNull())
        .join(dim_keys, on=fact_key, how="left_anti")
    )
    return dangling.count()


# ---------------------------------------------------------------------------
# Versioned publish + time travel
# ---------------------------------------------------------------------------


def publish_versioned(df: DataFrame, base_dir: str) -> int:
    """Publish a NEW immutable version of a table and flip the latest
    pointer; returns the version number.

    Layout: ``base_dir/v=N/`` per version plus a one-line ``_LATEST``
    pointer file. Old versions are never modified — readers pinned to a
    version (reproducible training runs, audits, diffs against
    yesterday) keep working while new versions land; the pointer flip is
    a single rename, so 'latest' readers see old-or-new, never half.
    This is the poor-man's snapshot isolation a Delta/Iceberg catalog
    provides natively (snapshot id ≙ version dir); retention/GC is a
    directory delete of versions older than the pin horizon.

    SCOPE: local/POSIX filesystems only (ADVICE r2). The version listing,
    pointer rename, and completeness check are driver-local ``os`` calls,
    so ``base_dir`` must be a path the driver sees as a real directory —
    NOT an HDFS/S3 URI (there they would silently operate on a local path
    that doesn't exist). On object storage use a table format's snapshot
    mechanism instead (``merge_upsert_delta``/``merge_upsert_iceberg``).
    A writer crashing mid-``df.write`` leaves a partial ``v=N`` directory
    WITHOUT the ``_SUCCESS`` marker; :func:`read_versioned` refuses to
    serve it, and the next publish skips past N (version numbers may have
    gaps after crashes — readers only ever see complete versions).
    """
    os.makedirs(base_dir, exist_ok=True)
    existing = [
        int(d.split("=", 1)[1])
        for d in os.listdir(base_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    version = (max(existing) + 1) if existing else 1
    vdir = os.path.join(base_dir, f"v={version}")
    df.write.mode("errorifexists").parquet(vdir)
    pointer_tmp = os.path.join(base_dir, f"_LATEST.__tmp__{uuid.uuid4().hex[:8]}")
    with open(pointer_tmp, "w") as f:
        f.write(str(version))
    os.rename(pointer_tmp, os.path.join(base_dir, "_LATEST"))
    return version


def read_versioned(spark: SparkSession, base_dir: str, version: int | None = None) -> DataFrame:
    """Time-travel read: the pinned ``version``, or latest via the
    pointer file when ``version`` is None.

    Requires the version directory's ``_SUCCESS`` marker (written by
    Spark's commit protocol on job success): a writer that crashed
    mid-``df.write`` leaves a partial directory, and serving it without
    error would be silent data loss (ADVICE r2). Local/POSIX paths only —
    see :func:`publish_versioned`.
    """
    if version is None:
        with open(os.path.join(base_dir, "_LATEST")) as f:
            version = int(f.read().strip())
    vdir = os.path.join(base_dir, f"v={version}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"no version {version} under {base_dir}")
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        raise FileNotFoundError(
            f"version {version} under {base_dir} is incomplete (no _SUCCESS "
            "marker — writer crashed mid-publish?); refusing to serve a "
            "partial table"
        )
    return spark.read.parquet(vdir)


# ---------------------------------------------------------------------------
# Multi-table atomic publish set (O10 closed: the reference's P-SF
# single-transaction semantics across dims + fact)
# ---------------------------------------------------------------------------

_SET_MANIFEST = "_SET_MANIFEST"


def _set_versions(base_dir: str) -> list[int]:
    if not os.path.isdir(base_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(base_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )


def _set_complete(base_dir: str, version: int) -> bool:
    """A set version is complete iff its manifest exists AND every table
    it names has Spark's ``_SUCCESS`` commit marker. The manifest is
    written after all tables, so its presence normally implies table
    completeness — the per-table check is belt-and-braces against
    manual tampering."""
    mpath = os.path.join(base_dir, f"v={version}", _SET_MANIFEST)
    if not os.path.exists(mpath):
        return False
    with open(mpath) as f:
        names = json.load(f)["tables"]
    vdir = os.path.join(base_dir, f"v={version}")
    return all(
        os.path.exists(os.path.join(vdir, name, "_SUCCESS")) for name in names
    )


def publish_set(
    tables: Mapping[str, DataFrame] | Sequence[tuple[str, DataFrame]],
    base_dir: str,
) -> int:
    """Publish MULTIPLE tables as ONE atomic unit; returns the version.
    The reference commits its three dimension MERGEs plus the fact syncs
    inside a single SQL transaction with rollback
    (``0. stored procedures/[UpdateDimSalesForceRestaurantAndDimFingerprint]/spScript.sql:20-22,345-357``)
    so a reader never observes a new dim joined to an old fact. Spark has
    no cross-table transactions; this is the same guarantee via a
    manifest + single-pointer commit:

    Layout::

        base_dir/
          v=N/
            <table>/        one parquet dir per table (Spark _SUCCESS)
            _SET_MANIFEST   written LAST inside v=N (names every table)
          _LATEST           one-line pointer — THE commit point

    Every table of version N is fully written, then the manifest, and
    only then does one atomic ``_LATEST`` rename flip readers over.
    Because :func:`read_published_set` resolves ALL tables of the set
    through that one pointer read, a crash at ANY point (between table
    writes, after tables before manifest, after manifest before flip)
    leaves readers on the complete previous version for every table —
    cross-table consistency is exactly the pointer's atomicity. Crash
    debris (a ``v=N`` without a manifest) is skipped by readers, skipped
    past by the next publish (version numbers may gap), and collected by
    :func:`vacuum_set_versions`.

    Same local/POSIX scope as :func:`publish_versioned` (driver-local
    ``os`` calls; on object storage use a real table format's
    transaction). Single-writer, like the reference's proc.
    """
    items = list(tables.items()) if isinstance(tables, Mapping) else list(tables)
    if not items:
        raise ValueError("publish_set of zero tables")
    names = [name for name, _ in items]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate table names in publish set: {names}")
    os.makedirs(base_dir, exist_ok=True)
    # CLAIM the version number with an atomic mkdir before any data is
    # written: two concurrent publishers that both compute N serialize
    # here — the loser retries at N+1 instead of both writing into the
    # same v=N and interleaving their part files (a torn-but-servable
    # set, since _set_complete only checks markers). Exactly the role
    # the putIfAbsent link plays in operators/deltalog.
    for _ in range(64):
        existing = _set_versions(base_dir)
        version = (existing[-1] + 1) if existing else 1
        vdir = os.path.join(base_dir, f"v={version}")
        try:
            os.mkdir(vdir)
            break
        except FileExistsError:
            continue
    else:
        raise RuntimeError(f"publish_set lost 64 version-claim races in {base_dir}")
    for name, df in items:
        df.write.mode("errorifexists").parquet(os.path.join(vdir, name))
    manifest = {"version": version, "tables": names}
    mtmp = os.path.join(vdir, f"{_SET_MANIFEST}.__tmp__{uuid.uuid4().hex[:8]}")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.rename(mtmp, os.path.join(vdir, _SET_MANIFEST))
    ptmp = os.path.join(base_dir, f"_LATEST.__tmp__{uuid.uuid4().hex[:8]}")
    with open(ptmp, "w") as f:
        f.write(str(version))
    os.rename(ptmp, os.path.join(base_dir, "_LATEST"))  # THE commit
    return version


def read_published_set(
    spark: SparkSession, base_dir: str, version: int | None = None
) -> dict[str, DataFrame]:
    """Read every table of a published set at one consistent version —
    the pinned ``version``, or latest via the pointer. All tables
    resolve through the SAME pointer read, so the result is always a
    transactionally consistent view (never version N's dim with version
    N-1's fact). Refuses incomplete versions (crash debris)."""
    if version is None:
        with open(os.path.join(base_dir, "_LATEST")) as f:
            version = int(f.read().strip())
    if not _set_complete(base_dir, version):
        raise FileNotFoundError(
            f"set version {version} under {base_dir} is missing or "
            "incomplete (no manifest / unfinished table write — crash "
            "debris?); refusing to serve a torn multi-table snapshot"
        )
    vdir = os.path.join(base_dir, f"v={version}")
    with open(os.path.join(vdir, _SET_MANIFEST)) as f:
        names = json.load(f)["tables"]
    return {n: spark.read.parquet(os.path.join(vdir, n)) for n in names}


def vacuum_set_versions(base_dir: str, keep_last: int = 3) -> list[int]:
    """Retention GC for the set layout, same contract as
    :func:`vacuum_versions`: the keep window counts COMPLETE versions
    only, the ``_LATEST`` target is pinned unconditionally, and
    incomplete (manifest-less) debris older than the newest version is
    swept. Returns removed version numbers."""
    versions = _set_versions(base_dir)
    if not versions:
        return []
    newest = versions[-1]
    complete = [v for v in versions if _set_complete(base_dir, v)]
    keep = set(complete[-keep_last:]) if keep_last > 0 else set()
    pointer_path = os.path.join(base_dir, "_LATEST")
    if os.path.exists(pointer_path):
        with open(pointer_path) as f:
            txt = f.read().strip()
        if txt.isdigit():
            keep.add(int(txt))
    removed = []
    for v in versions:
        is_complete = v in complete
        if (is_complete and v not in keep) or (not is_complete and v != newest):
            shutil.rmtree(os.path.join(base_dir, f"v={v}"))
            removed.append(v)
    return removed


def vacuum_versions(base_dir: str, keep_last: int = 3) -> list[int]:
    """Retention GC for the versioned layout: delete complete versions
    older than the newest ``keep_last`` COMPLETE versions, plus any
    incomplete (no ``_SUCCESS``) version directory that is not the
    newest — crash debris from a failed publish. The keep window is
    computed over complete versions only, and the ``_LATEST`` pointer
    target is additionally pinned unconditionally: a run of consecutive
    crashed publishes can therefore never age every readable version out
    of the window and destroy the history ``read_versioned`` serves
    (ADVICE r3). Returns the removed version numbers.

    Same local/POSIX scope as :func:`publish_versioned`. This is the
    ``VACUUM``/`expire_snapshots` half of the poor-man's snapshot story:
    without it a daily publish accumulates 365 copies a year; with it,
    storage is bounded by ``keep_last`` × table size while every kept
    version stays bit-exactly reproducible.
    """
    import shutil

    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(base_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    if not versions:
        return []
    newest = versions[-1]
    is_complete = {
        v: os.path.exists(os.path.join(base_dir, f"v={v}", "_SUCCESS"))
        for v in versions
    }
    complete_versions = [v for v in versions if is_complete[v]]
    # keep window over COMPLETE versions only: crash debris must never
    # crowd readable history out of the retention window (ADVICE r3)
    keep = set(complete_versions[-keep_last:]) if keep_last > 0 else set()
    pointer_path = os.path.join(base_dir, "_LATEST")
    if os.path.exists(pointer_path):
        with open(pointer_path) as f:
            txt = f.read().strip()
        if txt.isdigit():
            # belt-and-braces: the pointer target is never vacuumed, even
            # if retention config or a rolled-back pointer put it outside
            # the newest-keep_last window
            keep.add(int(txt))
    removed = []
    for v in versions:
        vdir = os.path.join(base_dir, f"v={v}")
        if (is_complete[v] and v not in keep) or (not is_complete[v] and v != newest):
            shutil.rmtree(vdir)
            removed.append(v)
    return removed
