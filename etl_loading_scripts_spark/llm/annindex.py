"""Persisted ANN index with incremental maintenance (round 10, VERDICT
r9 item 5).

Every ``ann_*`` query previously rebuilt its IVF cells per run; a
production corpus builds ONCE and probes many times. This module
materializes the IVF index as two Delta tables under one index root:

- ``centroids`` — the coarse centroid metadata (centroid_id, cv, cn):
  small, broadcast on every probe/append;
- ``cells`` — the inverted file: (vec_id, qv, norm2) HIVE-PARTITIONED
  BY centroid_id, so a probe's cell reads are pruned at the Delta-log
  metadata level and never touch other cells' files.

Maintenance is the ``dedup_minhash_incremental`` recipe: the index
STRUCTURE (centroids) is fixed at build; arrivals are routed into
their cells with the exact assignment rule the build used
(:func:`similarity._assign_to`) and APPENDED — one commit, touching
only the arrivals' cell partitions. Cost follows arrivals, never the
corpus. (Centroid re-training is a rebuild, as in real IVF systems.)

Scale: build is the one-shuffle IVF assignment + a partitioned write;
probe is broadcast(queries) → partition-pruned cell scan → per-cell
mini brute force → top-k window on query_id. At 10^9 vectors the
probe reads |probed cells| / |cells| of the index bytes; the
inputFiles audit in ``ann_index_build_probe`` pins exactly that (and
that the probe never re-reads the raw corpus parquet).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.llm.similarity import (
    CENTROID_STEP,
    N_QUERIES,
    TOP_K,
    _assign_to,
    _cosine_expr,
    _DOT_DUCK,
    _QVEC,
    _quantized,
)
from etl_loading_scripts_spark.operators.deltalog import (
    read_delta_table,
    write_delta_table,
)
from etl_loading_scripts_spark.registry import register

CELLS = "cells"
CENTROIDS = "centroids"
MANIFEST = "manifest"


def _manifest_pin(
    index_path: str, spark: SparkSession
) -> tuple[int | None, int | None]:
    """The (centroids_version, cells_version) pair the index MANIFEST
    pins — the round-11 atomic-swap layer: a rebuild overwrites both
    tables, and without a single commit point a reader could route
    queries through NEW centroids into OLD cells (absent partitions →
    silently empty probes). The manifest is itself a one-row Delta
    table, so pinning the pair is ONE atomic commit; readers of a
    pre-manifest index (r10 fixtures) fall back to latest-of-each,
    which is correct for build+append histories (appends never change
    centroid ids)."""
    mpath = os.path.join(index_path, MANIFEST)
    if not os.path.isdir(os.path.join(mpath, "_delta_log")):
        return None, None
    row = read_delta_table(spark, mpath).first()
    return int(row["centroids_version"]), int(row["cells_version"])


def _commit_manifest(
    spark: SparkSession, index_path: str, cents_v: int, cells_v: int
) -> None:
    write_delta_table(
        spark.createDataFrame(
            [(cents_v, cells_v)],
            "centroids_version long, cells_version long",
        ),
        os.path.join(index_path, MANIFEST),
        mode="overwrite",
    )


def _cents(index_path: str, spark: SparkSession) -> DataFrame:
    cv, _ = _manifest_pin(index_path, spark)
    return read_delta_table(
        spark, os.path.join(index_path, CENTROIDS), version=cv
    )


def _cells_df(index_path: str, spark: SparkSession, **kwargs) -> DataFrame:
    _, xv = _manifest_pin(index_path, spark)
    return read_delta_table(
        spark, os.path.join(index_path, CELLS), version=xv, **kwargs
    )


def ann_index_build(
    spark: SparkSession, emb: DataFrame, index_path: str
) -> dict:
    """Build the persisted IVF index from an embeddings frame
    (vec_id, label, embedding): quantize, pick the deterministic
    coarse centroids (vec_id % CENTROID_STEP == 0 — same rule as
    ``ann_ivf_topk``, which keeps the index oracle-checkable), assign,
    and commit centroids + cell-partitioned vectors as Delta tables,
    pinned together by the manifest commit. Returns {vectors, cells}."""
    n = _quantized(emb).select("vec_id", "qv", "norm2")
    centroids = n.filter(F.col("vec_id") % CENTROID_STEP == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("qv").alias("cv"),
        F.col("norm2").alias("cn"),
    )
    cents_v = write_delta_table(centroids, os.path.join(index_path, CENTROIDS))
    assigned = _assign_to(n, centroids)
    cells_v = write_delta_table(
        assigned, os.path.join(index_path, CELLS),
        partition_by=["centroid_id"],
    )
    _commit_manifest(spark, index_path, cents_v, cells_v)
    cells = _cells_df(index_path, spark)
    return {
        "vectors": cells.count(),
        "cells": cells.select("centroid_id").distinct().count(),
    }


def ann_index_append(
    spark: SparkSession, emb: DataFrame, index_path: str
) -> dict:
    """Incremental maintenance: route NEW embeddings into the stored
    cells (broadcast the index's own centroids — never re-derived from
    the arrivals) and APPEND. One cells commit, then the manifest pin —
    only the arrivals' cell partitions gain files, every other cell's
    files stay byte-identical (Delta append never rewrites); a crash
    between the two commits leaves the manifest pinning the pre-append
    state (the append invisible, retry-safe), never a torn pair. Cost
    follows arrivals."""
    n = _quantized(emb).select("vec_id", "qv", "norm2")
    assigned = _assign_to(n, _cents(index_path, spark))
    cells_v = write_delta_table(
        assigned, os.path.join(index_path, CELLS), mode="append"
    )
    cv, _ = _manifest_pin(index_path, spark)
    if cv is None:
        from etl_loading_scripts_spark.operators.deltalog import _all_versions

        cv = _all_versions(os.path.join(index_path, CENTROIDS))[-1]
    _commit_manifest(spark, index_path, cv, cells_v)
    return {"appended": n.count()}


def ann_index_rebuild(spark: SparkSession, index_path: str) -> dict:
    """RE-TRAIN the index in place — the action
    :data:`REBUILD_IMBALANCE_FACTOR` recommends once drift concentrates
    cells: derive fresh centroids from the CURRENT pinned corpus (same
    deterministic vec_id % CENTROID_STEP rule over ALL ids, so drifted
    arrivals now seed their own cells), re-assign every vector, and
    OVERWRITE both tables — the swap becomes visible ATOMICALLY at the
    manifest commit (until then every probe resolves the OLD pinned
    pair through time travel; a crash mid-rebuild leaves the old index
    fully live). Returns the post-rebuild balance report row as a dict.

    Scale: one broadcast-assign shuffle over the corpus + a partitioned
    write — the same cost as the original build, paid on the audit's
    recommendation cadence instead of never."""
    n = _cells_df(index_path, spark).select("vec_id", "qv", "norm2")
    centroids = n.filter(F.col("vec_id") % CENTROID_STEP == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("qv").alias("cv"),
        F.col("norm2").alias("cn"),
    )
    cents_v = write_delta_table(
        centroids, os.path.join(index_path, CENTROIDS), mode="overwrite"
    )
    assigned = _assign_to(n, centroids)
    cells_v = write_delta_table(
        assigned, os.path.join(index_path, CELLS), mode="overwrite"
    )
    _commit_manifest(spark, index_path, cents_v, cells_v)
    return index_balance_report(spark, index_path).first().asDict()


def _assign_top_p(
    queries: DataFrame, centroids: DataFrame, nprobe: int
) -> DataFrame:
    """Each query paired with its ``nprobe`` NEAREST cells (rank ≤
    nprobe instead of rank 1) — the classic IVF recall knob: probing
    P cells multiplies candidates ~P-fold and recovers neighbors that
    fell just across a cell boundary."""
    sim = _cosine_expr("qv", "cv", "norm2", "cn")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("centroid_sim").desc(), "centroid_id"
    )
    return (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("centroid_sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("vec_id", "qv", "norm2", "centroid_id")
    )


def ann_index_probe(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    k: int = TOP_K,
    nprobe: int = 1,
    return_probed: bool = False,
):
    """Serve cosine top-k from the PERSISTED index: assign each query
    to its ``nprobe`` nearest cells (broadcast centroids), then read
    ONLY the probed cells — partition pruning happens in the Delta
    log, so unprobed cells' files never reach Spark's scan.
    ``queries`` carries (vec_id, qv, norm2). ``return_probed=True``
    additionally returns the pruned cell reader (for file audits)
    without re-planning the assignment."""
    # ONE manifest read pins BOTH table versions (r14): the previous
    # shape read the manifest separately inside _cents and _cells_df —
    # two Spark jobs on a one-row table per probe, and a rebuild
    # committing between the two reads could route NEW centroids into
    # OLD cells, the exact straddle the manifest exists to prevent.
    cv, xv = _manifest_pin(index_path, spark)
    cents = read_delta_table(
        spark, os.path.join(index_path, CENTROIDS), version=cv
    )
    # persisted: the assignment is consumed twice (cell-id collect,
    # then the broadcast side of the cell join) and is O(queries ×
    # nprobe) tiny by contract. r15 NOTE (VERDICT r14 item 10): two
    # leak-free shapes were built and measured — driver-local rows
    # (pickled vectors, +0.35 s/probe) and an Arrow round-trip
    # (toArrow → createDataFrame, wall-neutral) — but the Arrow shape
    # deterministically tipped a 351-query single-session sweep into a
    # heap OOM at the same later query across two runs (the tree
    # without it sweeps 351/351 in the same session shape), so the
    # proven persist stands; its footprint is O(queries × nprobe) per
    # probe and it survived the r14 and r15 full sweeps.
    q = _assign_top_p(queries, cents, nprobe).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qa"),
        F.col("norm2").alias("na"),
        "centroid_id",
    ).persist()
    # O(queries) driver-side cell list — the probe set IS small by
    # contract (a batch of queries), never the corpus
    cell_ids = sorted(
        r.centroid_id for r in q.select("centroid_id").distinct().collect()
    )
    cells = read_delta_table(
        spark, os.path.join(index_path, CELLS), version=xv,
        partition_filter={"centroid_id": cell_ids},
    )
    scored = (
        cells.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("qv").alias("qb"),
            F.col("norm2").alias("nb"),
            "centroid_id",
        )
        .join(F.broadcast(q), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _cosine_expr("qa", "qb", "na", "nb"))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return (out, cells) if return_probed else out


def _index_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Plant-once index fixture exercising BOTH lifecycle legs: build
    from the corpus MINUS a holdout slice (vec_id % 10 == 7, centroid
    vectors excluded so the stored centroid set equals the full-corpus
    rule), then APPEND the holdout — the final index state must equal
    a from-scratch build, which is what the oracle derives."""
    from etl_loading_scripts_spark.operators.deltalog import _fixture_dir

    # rev-keyed: the index IS a set of Delta tables, so an on-disk
    # format bump must invalidate this cache too
    root = _fixture_dir(sf_dir, tag="ann_index")
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        return root
    import shutil

    if os.path.isdir(root):
        shutil.rmtree(root)  # partial build: never serve it
    emb = load_table(spark, sf_dir, "embeddings")
    holdout = (F.col("vec_id") % 10 == 7) & (
        F.col("vec_id") % CENTROID_STEP != 0
    )
    ann_index_build(spark, emb.filter(~holdout), root)
    ann_index_append(spark, emb.filter(holdout), root)
    with open(marker, "w") as fh:
        fh.write("ok")
    return root


@register(
    "ann_index_build_probe",
    oracle=f"""
    WITH n AS (
        SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS norm2
        FROM (SELECT vec_id, {_QVEC} AS qv FROM embeddings)
    ),
    centroids AS (
        SELECT vec_id AS centroid_id, qv AS cv, norm2 AS cn FROM n
        WHERE vec_id % {CENTROID_STEP} = 0
    ),
    assigned AS (
        SELECT vec_id, qv, norm2, centroid_id
        FROM (
            SELECT v.vec_id, v.qv, v.norm2, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY CAST({_DOT_DUCK.format(a='v.qv', b='c.cv')} AS DOUBLE)
                                / sqrt(CAST(v.norm2 AS DOUBLE)) / sqrt(CAST(c.cn AS DOUBLE)) DESC,
                                c.centroid_id
                   ) AS rn
            FROM n v CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST({_DOT_DUCK.format(a='a.qv', b='b.qv')} AS DOUBLE)
                   / sqrt(CAST(a.norm2 AS DOUBLE)) / sqrt(CAST(b.norm2 AS DOUBLE)) AS cosine
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id
         AND a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank,
           CAST(1 AS INT) AS probe_reads_index_only,
           CAST(1 AS INT) AS probe_pruned_cells
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    doc="PERSISTED ANN index lifecycle (round 10): build the IVF index "
    "as Delta tables (centroids + cell-partitioned vectors) from the "
    "corpus minus a holdout, APPEND the holdout through incremental "
    "maintenance (stored centroids route arrivals), then serve top-k "
    "probes FROM THE INDEX. The probe's file audit is part of the "
    "oracle: probe_reads_index_only = no embeddings.parquet in the "
    "probe scan's inputFiles; probe_pruned_cells = the cell scan read "
    "a strict subset of the cells table's files. Results must equal "
    "ann_ivf_topk (same assignment rule) — a torn append, stale "
    "centroid set, or pruning bug mismatches.",
)
def ann_index_build_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale notes in the module docstring; the fixture's build+append
    is plant-once — a deployed index builds once and serves probes at
    O(probed cells) reads per batch."""
    root = _index_fixture(spark, sf_dir)
    # queries come from the INDEX too — the whole probe path touches
    # only index tables (the audit below pins it)
    cells_all = _cells_df(root, spark)
    queries = cells_all.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "qv", "norm2"
    )
    # file audit rides the SAME probe plan (no re-planning): the
    # candidate scan reads index files only, and STRICTLY FEWER files
    # than the full cells table (pruning)
    out, probed = ann_index_probe(spark, queries, root, return_probed=True)
    probe_files = set(probed.inputFiles())
    all_files = set(cells_all.inputFiles())
    index_only = all(
        "embeddings.parquet" not in f for f in probe_files
    ) and probe_files <= all_files
    pruned = len(probe_files) < len(all_files)
    return out.select(
        "query_id", "neighbor_id", "cosine", "rank",
        F.lit(int(index_only)).alias("probe_reads_index_only"),
        F.lit(int(pruned)).alias("probe_pruned_cells"),
    )


NPROBE = 2


@register(
    "ann_index_multiprobe",
    oracle=f"""
    WITH n AS (
        SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS norm2
        FROM (SELECT vec_id, {_QVEC} AS qv FROM embeddings)
    ),
    centroids AS (
        SELECT vec_id AS centroid_id, qv AS cv, norm2 AS cn FROM n
        WHERE vec_id % {CENTROID_STEP} = 0
    ),
    ranked AS (
        SELECT v.vec_id, v.qv, v.norm2, c.centroid_id,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY CAST({_DOT_DUCK.format(a='v.qv', b='c.cv')} AS DOUBLE)
                            / sqrt(CAST(v.norm2 AS DOUBLE)) / sqrt(CAST(c.cn AS DOUBLE)) DESC,
                            c.centroid_id
               ) AS rn
        FROM n v CROSS JOIN centroids c
    ),
    cells AS (SELECT vec_id, qv, norm2, centroid_id FROM ranked WHERE rn = 1),
    probes AS (
        SELECT vec_id, qv, norm2, centroid_id FROM ranked
        WHERE rn <= {NPROBE} AND vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST({_DOT_DUCK.format(a='p.qv', b='b.qv')} AS DOUBLE)
                   / sqrt(CAST(p.norm2 AS DOUBLE)) / sqrt(CAST(b.norm2 AS DOUBLE)) AS cosine
        FROM probes p JOIN cells b
          ON p.centroid_id = b.centroid_id AND b.vec_id <> p.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS INT) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    doc=f"Multiprobe from the PERSISTED index (nprobe={NPROBE}): each "
    "query probes its 2 nearest stored cells — the IVF recall knob "
    "served from the same index tables, candidates bounded by "
    "nprobe/|cells| of the corpus, cell reads still partition-pruned.",
)
def ann_index_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: candidates grow ~nprobe-fold over the rank-1 probe and
    the cell read stays log-metadata pruned — the recall/cost dial a
    production index turns per query batch, without touching the
    stored cells."""
    root = _index_fixture(spark, sf_dir)
    queries = (
        _cells_df(root, spark)
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "qv", "norm2")
    )
    return ann_index_probe(spark, queries, root, nprobe=NPROBE)


# --------------------------------------------------------------------------
# Round 11: index health under DRIFT — cell-skew audit + rebuild trigger
# --------------------------------------------------------------------------

#: imbalance factor (max cell ÷ uniform ideal) above which the module
#: recommends re-training centroids (a rebuild). Measured on this
#: corpus by tools/bench_ann_drift.py (SCALING.md r11): recall@10 of
#: the rank-1 probe HOLDS under drift (0.30 → 0.27 from imbalance
#: 1.18 → 3.85 — jittered arrivals land beside their originals, so
#: the right cell still contains the right neighbors), but the probe
#: COST does not — the imbalance factor IS the candidate-volume
#: multiplier a query landing in the hot cell pays (measured
#: max-candidates 59 → 303 as imbalance 1.18 → 3.85, mean 48 → 103).
#: 2.5 = the tail-latency multiplier at which re-training buys back
#: more than the rebuild costs on a monthly cadence.
REBUILD_IMBALANCE_FACTOR = 2.5


def index_cell_sizes(spark: SparkSession, index_path: str) -> DataFrame:
    """Per-cell population of the PERSISTED index, derived from the
    Delta log's add-action stats (numRecords per file, summed per
    centroid_id partition) — METADATA ONLY, no data scan: the audit a
    deployed index runs after every append batch. Falls back to a
    pruned count for files written without stats."""
    import json as _json

    from etl_loading_scripts_spark.operators.deltalog import (
        _snapshot_state,
    )

    cells_path = os.path.join(index_path, CELLS)
    _, xv = _manifest_pin(index_path, spark)
    active, _, _ = _snapshot_state(cells_path, xv)
    sizes: dict[str, int] = {}
    missing: set[str] = set()
    for a in active.values():
        cid = (a.get("partitionValues") or {}).get("centroid_id")
        stats = a.get("stats")
        n = None
        if stats:
            try:
                n = _json.loads(stats).get("numRecords")
            except ValueError:
                n = None
        if n is None:
            missing.add(cid)
        else:
            sizes[cid] = sizes.get(cid, 0) + int(n)
    if missing:  # stats-less files: count just those partitions
        # The pruned count covers EVERY file in the partition, so a
        # partition mixing stats-bearing and stats-less files must
        # drop its stats-derived tally first or it double-counts
        # (ADVICE r11): the count REPLACES the partial sum. Seed 0
        # rather than popping — a centroid whose partition holds only
        # statless ZERO-row files gets no row back from the count and
        # would otherwise vanish from the report instead of appearing
        # with cell_size 0 (ADVICE r12 low).
        for cid in missing:
            sizes[cid] = 0
        counted = (
            read_delta_table(
                spark, cells_path,
                partition_filter={"centroid_id": sorted(missing)},
            )
            .groupBy("centroid_id")
            .count()
            .collect()
        )
        for r in counted:
            sizes[str(r["centroid_id"])] = int(r["count"])
    return spark.createDataFrame(
        [(int(c), n) for c, n in sorted(sizes.items(), key=lambda kv: int(kv[0]))],
        "centroid_id long, cell_size long",
    )


def index_balance_report(spark: SparkSession, index_path: str) -> DataFrame:
    """One-row index-health report from :func:`index_cell_sizes`:
    the ivf_cell_balance_audit factors computed over the STORED index
    (so drift from appends is visible, unlike the build-time audit) +
    the rebuild recommendation against REBUILD_IMBALANCE_FACTOR."""
    sizes = index_cell_sizes(spark, index_path)
    return sizes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("cell_size").cast("bigint").alias("n_vectors"),
        F.max("cell_size").cast("bigint").alias("max_cell"),
        F.min("cell_size").cast("bigint").alias("min_cell"),
        F.sum(F.col("cell_size") * F.col("cell_size"))
        .cast("bigint").alias("sum_sq"),
    ).select(
        "n_cells", "n_vectors", "max_cell", "min_cell",
        (F.col("max_cell").cast("double") * F.col("n_cells")
         / F.col("n_vectors")).alias("imbalance_factor"),
        (F.col("sum_sq").cast("double") * F.col("n_cells")
         / (F.col("n_vectors").cast("double") * F.col("n_vectors"))
         ).alias("probe_cost_factor"),
        (
            (F.col("max_cell").cast("double") * F.col("n_cells")
             / F.col("n_vectors"))
            > F.lit(REBUILD_IMBALANCE_FACTOR)
        ).cast("int").alias("rebuild_recommended"),
    )


DRIFT_COPIES = 7  # past the threshold: the fixture's audit must FIRE


def _drift_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Plant-once DRIFTED index: build from the full corpus, then
    append DRIFT_COPIES replicas of the LOWEST centroid's cell members
    (vec_id offset per copy) — every replica routes through the STORED
    centroids back into that same cell, concentrating it ×(1+COPIES):
    the silent skew a drifting embedding distribution produces."""
    from etl_loading_scripts_spark.operators.deltalog import _fixture_dir

    root = _fixture_dir(sf_dir, tag="ann_drift")
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        return root
    import shutil

    if os.path.isdir(root):
        shutil.rmtree(root)
    emb = load_table(spark, sf_dir, "embeddings")
    ann_index_build(spark, emb, root)
    cells = _cells_df(root, spark)
    c0 = cells.agg(F.min("centroid_id")).first()[0]
    members = load_table(spark, sf_dir, "embeddings").join(
        cells.filter(F.col("centroid_id") == c0).select("vec_id"),
        "vec_id", "left_semi",
    )
    for i in range(1, DRIFT_COPIES + 1):
        ann_index_append(
            spark,
            members.withColumn(
                "vec_id", F.col("vec_id") + F.lit(10_000_000 * i)
            ),
            root,
        )
    with open(marker, "w") as fh:
        fh.write("ok")
    return root


@register(
    "ann_index_drift_audit",
    oracle=f"""
    WITH n AS (
        SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS norm2
        FROM (SELECT vec_id, {_QVEC} AS qv FROM embeddings)
    ),
    centroids AS (
        SELECT vec_id AS centroid_id, qv AS cv, norm2 AS cn FROM n
        WHERE vec_id % {CENTROID_STEP} = 0
    ),
    assigned AS (
        SELECT vec_id, centroid_id
        FROM (
            SELECT v.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY CAST({_DOT_DUCK.format(a='v.qv', b='c.cv')} AS DOUBLE)
                                / sqrt(CAST(v.norm2 AS DOUBLE)) / sqrt(CAST(c.cn AS DOUBLE)) DESC,
                                c.centroid_id
                   ) AS rn
            FROM n v CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    c0 AS (SELECT MIN(centroid_id) AS c FROM centroids),
    sizes AS (
        SELECT a.centroid_id,
               CAST(COUNT(*) * CASE WHEN a.centroid_id = c0.c
                                    THEN 1 + {DRIFT_COPIES} ELSE 1 END
                    AS BIGINT) AS cell_size
        FROM assigned a CROSS JOIN c0
        GROUP BY a.centroid_id, c0.c
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(cell_size) AS BIGINT) AS n_vectors,
               CAST(MAX(cell_size) AS BIGINT) AS max_cell,
               CAST(MIN(cell_size) AS BIGINT) AS min_cell,
               CAST(SUM(cell_size * cell_size) AS BIGINT) AS sum_sq
        FROM sizes
    )
    SELECT n_cells, n_vectors, max_cell, min_cell,
           CAST(max_cell AS DOUBLE) * n_cells / n_vectors AS imbalance_factor,
           CAST(sum_sq AS DOUBLE) * n_cells
               / (CAST(n_vectors AS DOUBLE) * n_vectors) AS probe_cost_factor,
           CAST(CASE WHEN CAST(max_cell AS DOUBLE) * n_cells / n_vectors
                          > {REBUILD_IMBALANCE_FACTOR} THEN 1 ELSE 0 END
                AS INT) AS rebuild_recommended
    FROM tot
    """,
    doc="INDEX DRIFT audit (round 11, VERDICT r10 item 5): appends "
    "route through FIXED build-time centroids, so a drifting embedding "
    "distribution silently concentrates cells. The fixture plants the "
    f"drift (build, then append {DRIFT_COPIES} replicas of the lowest "
    "centroid's cell through the normal maintenance path) and the "
    "audit reads per-cell populations FROM THE DELTA LOG's add-action "
    "stats (metadata only, no data scan), rolling them into the "
    "imbalance / probe-cost factors and the rebuild recommendation "
    "against the measured REBUILD_IMBALANCE_FACTOR threshold. A torn "
    "append, stats drift, or mis-routed replica mismatches.",
)
def ann_index_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the audit is O(index files) driver metadata + a one-row
    aggregate — the post-append health check a deployed index runs on
    every maintenance batch; the skew→recall/cost curve behind the
    threshold is measured by tools/bench_ann_drift.py (SCALING.md r11)."""
    root = _drift_fixture(spark, sf_dir)
    return index_balance_report(spark, root)


def ann_index_maintain(spark: SparkSession, index_path: str) -> dict:
    """The maintenance entry point that closes the index lifecycle
    (round 12, VERDICT r11 item 6): audit drift from LOG METADATA
    alone (:func:`index_balance_report` — per-cell populations from
    add-action stats, no vector scan) and, when the imbalance crosses
    :data:`REBUILD_IMBALANCE_FACTOR`, run :func:`ann_index_rebuild`
    behind its atomic manifest swap. Call it on the same month-close
    cadence as ``publish_set_deltalog``'s ``optimize`` hook — the
    opt-in pattern: nothing happens below the threshold, and a crash
    mid-rebuild leaves the old index fully live.

    Returns ``{"rebuilt": bool, "before": {...}, "after": {...} |
    None}`` — the before/after balance rows so the caller's run log
    records what the audit saw and what the rebuild bought."""
    before = index_balance_report(spark, index_path).first().asDict()
    if not before["rebuild_recommended"]:
        return {"rebuilt": False, "before": before, "after": None}
    after = ann_index_rebuild(spark, index_path)
    return {"rebuilt": True, "before": before, "after": after}
