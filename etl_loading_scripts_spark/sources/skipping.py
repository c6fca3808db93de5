"""File-skipping index: per-file min/max + bloom, served to point reads.

The executing counterpart of ``zorder_layout_stats`` (which reports the
statistics a skipping index WOULD persist): this module actually writes
a multi-file parquet layout, builds a persisted index over the REAL
files (per-file min/max of the layout key plus a bloom filter over an
uncorrelated point-lookup key), and serves point queries by reading
ONLY the files the index admits — the Delta/Iceberg/Hudi data-skipping
pattern (file statistics in the transaction log / manifest, bloom
indexes for keys the sort order can't help).

Why both statistics: the layout is range-bucketed on ``o_custkey``, so
min/max prunes custkey probes to ~1 file — but every file's ORDERKEY
range spans the whole domain, so min/max is useless for orderkey point
lookups; the bloom filter (3 arithmetic hashes into a 65,536-position
space, stored as each file's distinct position set) prunes those to the
true file plus rare false positives. That split is exactly why
lakehouses grew bloom indexes next to column stats.

Scale: the index is metadata — one row per FILE (at 100 TB with 1 GiB
files that is ~10^5 rows, kilobytes of positions each), so the probe
planner collects it to the driver the way Delta replays its log; data
files are never listed, let alone read, until the index admits them.
The position-set encoding is semantically a bloom bitmap (production
systems pack it to bits; the set form keeps the DuckDB oracle able to
recompute membership exactly).

Reference behavior modeled: none (the reference's SQL Server relies on
b-tree indexes, SURVEY §3); this is the lakehouse-native equivalent the
Spark engine needs at scale.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

#: Range buckets = files in the demo layout.
N_FILES = 16

#: Bloom position space (positions, not bytes; ~4 bits/key at sf0.1).
BLOOM_M = 65536

#: (multiplier, offset) per hash; h = ((k*A + B) % 1000003) % BLOOM_M —
#: plain integer arithmetic so Spark and DuckDB compute bit-identically.
BLOOM_HASHES = [(31, 7), (37, 11), (41, 13)]

_P = 1000003


def _hash_exprs(col: str) -> list[str]:
    return [
        f"(({col} * {a} + {b}) % {_P}) % {BLOOM_M}" for a, b in BLOOM_HASHES
    ]


def _layout_dir(sf_dir: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"skip_layout_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )


def write_bucketed_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write orders range-bucketed on o_custkey into ``N_FILES``
    single-file partitions (the shape a lakehouse OPTIMIZE/cluster
    produces); returns the layout path. Deterministic: bucket =
    custkey * N // (max+1), one task per bucket."""
    path = _layout_dir(sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    maxc = orders.agg(F.max("o_custkey")).collect()[0][0]
    (
        orders.withColumn(
            "b",
            F.least(
                (F.col("o_custkey") * N_FILES / (maxc + 1)).cast("int"),
                F.lit(N_FILES - 1),
            ),
        )
        .repartition(N_FILES, "b")
        .write.mode("overwrite")
        .partitionBy("b")
        .parquet(path)
    )
    return path


def build_file_index(spark: SparkSession, path: str) -> str:
    """Build and PERSIST the skipping index over the real files at
    ``path``: one row per file with (min, max, rows) of o_custkey and
    the distinct bloom positions of o_orderkey. Returns the index path.

    Scale: one scan of the table (column-pruned to the two keys), one
    shuffle at (file, position) grain for the distinct, one at file
    grain for the stats — then the index is metadata forever after
    (rebuilt incrementally per new file in a real log)."""
    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    stats = df.groupBy("file").agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    h = _hash_exprs("o_orderkey")
    positions = (
        df.select("file", F.explode(F.array(*[F.expr(x) for x in h])).alias("pos"))
        .distinct()
        .groupBy("file")
        .agg(F.sort_array(F.collect_set("pos")).alias("bloom_pos"))
    )
    index = stats.join(positions, "file")
    index_path = path + "_index"
    index.write.mode("overwrite").parquet(index_path)
    return index_path


def update_file_index(spark: SparkSession, path: str, index_path: str) -> int:
    """Incrementally maintain the index: scan ONLY files present in the
    layout but absent from the index (new files from appends/compaction)
    and append their rows; returns how many files were indexed. This is
    the steady-state cost model of lakehouse statistics — per NEW file,
    never a table rescan (a 100 TB table's nightly append indexes
    gigabytes, not the table)."""
    have = {
        r["file"]
        for r in spark.read.parquet(index_path).select("file").collect()
    }
    df = spark.read.parquet(path).withColumn("file", F.input_file_name())
    fresh = df.filter(~F.col("file").isin(list(have))) if have else df
    new_files = fresh.select("file").distinct().count()
    if new_files == 0:
        return 0
    stats = fresh.groupBy("file").agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    h = _hash_exprs("o_orderkey")
    positions = (
        fresh.select(
            "file", F.explode(F.array(*[F.expr(x) for x in h])).alias("pos")
        )
        .distinct()
        .groupBy("file")
        .agg(F.sort_array(F.collect_set("pos")).alias("bloom_pos"))
    )
    stats.join(positions, "file").write.mode("append").parquet(index_path)
    return new_files


def probe_index(
    spark: SparkSession, index_path: str, custkey: int | None, orderkey: int | None
) -> list[str]:
    """Plan a point read: return the files the index admits for the
    given predicate (custkey → min/max, orderkey → bloom membership;
    both → intersection). Driver-side over collected index metadata —
    the Delta-log-replay pattern; data files are untouched."""
    rows = spark.read.parquet(index_path).collect()
    out = []
    for r in rows:
        if custkey is not None and not (r["min_ck"] <= custkey <= r["max_ck"]):
            continue
        if orderkey is not None:
            pos = set(r["bloom_pos"])
            want = [((orderkey * a + b) % _P) % BLOOM_M for a, b in BLOOM_HASHES]
            if not all(p in pos for p in want):
                continue
        out.append(r["file"])
    return sorted(out)


@register(
    "file_skipping_index_probe",
    oracle=f"""
    WITH dom AS (
        SELECT max(o_custkey) AS maxc, max(o_orderkey) AS maxo FROM orders
    ),
    bkt AS (
        SELECT o.o_orderkey, o.o_custkey,
               LEAST((o.o_custkey * {N_FILES}) // (d.maxc + 1), {N_FILES - 1})
                   AS b
        FROM orders o CROSS JOIN dom d
    ),
    minmax AS (
        SELECT b, min(o_custkey) AS mn, max(o_custkey) AS mx
        FROM bkt GROUP BY b
    ),
    cprobe AS (
        SELECT j, (d.maxc * (2 * j + 1)) // {2 * N_FILES} AS pc
        FROM range(0, 8) t(j) CROSS JOIN dom d
    ),
    oprobe AS (
        SELECT j, (d.maxo * (2 * j + 1)) // {2 * N_FILES} AS po
        FROM range(0, 8) t(j) CROSS JOIN dom d
    )
    SELECT 'custkey_minmax' AS kind,
           CAST(pc AS BIGINT) AS probe,
           CAST((SELECT count(*) FROM minmax) AS INT) AS n_files,
           CAST((SELECT count(*) FROM minmax m
                 WHERE pc BETWEEN m.mn AND m.mx) AS INT) AS n_files_pass,
           CAST((SELECT count(*) FROM orders o WHERE o.o_custkey = pc)
                AS BIGINT) AS rows_found
    FROM cprobe
    UNION ALL
    SELECT 'orderkey_bloom' AS kind,
           CAST(po AS BIGINT) AS probe,
           CAST((SELECT count(*) FROM minmax) AS INT) AS n_files,
           CAST((SELECT count(DISTINCT g.b) FROM minmax g
                 WHERE NOT EXISTS (
                     SELECT 1 FROM (VALUES
                         (((po * 31 + 7) % {_P}) % {BLOOM_M}),
                         (((po * 37 + 11) % {_P}) % {BLOOM_M}),
                         (((po * 41 + 13) % {_P}) % {BLOOM_M})) q(p)
                     WHERE NOT EXISTS (
                         SELECT 1 FROM bkt k WHERE k.b = g.b AND (
                             ((k.o_orderkey * 31 + 7) % {_P}) % {BLOOM_M} = q.p
                          OR ((k.o_orderkey * 37 + 11) % {_P}) % {BLOOM_M} = q.p
                          OR ((k.o_orderkey * 41 + 13) % {_P}) % {BLOOM_M} = q.p)))
                ) AS INT) AS n_files_pass,
           CAST((SELECT count(*) FROM orders o WHERE o.o_orderkey = po)
                AS BIGINT) AS rows_found
    FROM oprobe
    """,
    doc="EXECUTING file-skipping index (lakehouse data skipping): writes "
    "a real 16-file range-bucketed layout, persists a per-file index "
    "(custkey min/max + an orderkey bloom as distinct hash positions), "
    "then serves 8 custkey and 8 orderkey point probes by reading ONLY "
    "the admitted files. min/max prunes the layout key to ~1 file; the "
    "bloom prunes the uncorrelated key the sort order can't help — the "
    "exact reason lakehouses persist bloom indexes next to column "
    "stats. rows_found comes from the real pruned reads, so a false "
    "negative anywhere loses rows and hash-mismatches.",
)
def file_skipping_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: index build is one column-pruned scan + two bounded
    shuffles; probing is driver-side metadata (one row per file — the
    same cardinality Delta replays from its log); each point read then
    opens only the admitted files. The 16-probe result is assembled as
    a union of pruned single-file scans — one Spark job, no full-table
    pass anywhere after the build."""
    path = write_bucketed_layout(spark, sf_dir)
    index_path = build_file_index(spark, path)
    n_files = spark.read.parquet(index_path).count()

    dom = load_table(spark, sf_dir, "orders").agg(
        F.max("o_custkey"), F.max("o_orderkey")
    ).collect()[0]
    maxc, maxo = int(dom[0]), int(dom[1])

    probes = []
    for j in range(8):
        probes.append(("custkey_minmax", (maxc * (2 * j + 1)) // (2 * N_FILES)))
    for j in range(8):
        probes.append(("orderkey_bloom", (maxo * (2 * j + 1)) // (2 * N_FILES)))

    parts = []
    for kind, val in probes:
        if kind == "custkey_minmax":
            files = probe_index(spark, index_path, custkey=val, orderkey=None)
            pred = F.col("o_custkey") == val
        else:
            files = probe_index(spark, index_path, custkey=None, orderkey=val)
            pred = F.col("o_orderkey") == val
        base = (
            spark.read.option("basePath", path).parquet(*files).filter(pred)
            .agg(F.count(F.lit(1)).alias("rows_found"))
            if files
            else spark.range(1).select(F.lit(0).cast("long").alias("rows_found"))
        )
        parts.append(
            base.select(
                F.lit(kind).alias("kind"),
                F.lit(val).cast("long").alias("probe"),
                F.lit(n_files).cast("int").alias("n_files"),
                F.lit(len(files)).cast("int").alias("n_files_pass"),
                F.col("rows_found"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
