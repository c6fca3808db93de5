#!/usr/bin/env python
"""Dim-publish wall vs CHANGES (round 11, VERDICT r10 item 1 done-bar).

The staged publish's dims moved from full overwrite per set version to
the entity-keyed file-pruned merge (merge_dim_deltalog). This tool
measures what that buys at growing dim size — the axis the reference's
patron dim (its largest table) actually grows on — for a fixed change
batch, across the three change shapes that matter:

- inserts_only: N new entities (the reference's insert-if-absent
  cadence) — the merge must write ~one new file and rewrite NOTHING;
- localized_updates: N updates clustered in the key space (a
  re-mapped cohort) — rewrites only the covering files;
- scattered_updates: N updates uniform over the key space — the
  HONEST boundary of the rewrite mode: with ~N >> file count every
  file contains a change and the merge degenerates to a full rewrite
  plus the diff join (documented, not hidden);
- scattered_updates_dv: the same scattered batch with
  deletion_vectors=True — changed rows hide behind DVs (files stay
  byte-identical) and post-images append, so write volume returns to
  O(changes) regardless of locality.
- localized_upsert / scattered_upsert (round 12): the UPSERT cadence —
  the source carries ONLY the churn (no full-sync state), so the diff's
  target scan is stats-pruned to the files whose key range the source
  can touch: the localized leg diffs O(locality) files (the r11 seam
  "the UPDATE cadence still scans the whole dim" closed); the
  scattered leg shows the honest non-pruning boundary (uniform churn
  touches every file's range).

Per leg: wall seconds, files rewritten/kept, bytes written. The full
overwrite is the baseline every leg used to pay. Prints ONE JSON line;
the table lives in SCALING.md r11.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_loading_scripts_spark.operators import deltalog as dl  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402

N_CHANGES = 2_000
N_FILES = 64


def _dim(spark, n):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("patron_"), F.col("id")).alias("nm"),
        F.sha2(F.col("id").cast("string"), 256).alias("blob"),
        (F.col("id") % 1000).cast("decimal(18,4)").alias("bal"),
    )


def _bytes_written(table, version):
    """Bytes the commit actually WROTE: new data files plus DV bitmap
    bytes — a DV re-add references the ORIGINAL file (not rewritten),
    so its size must not count."""
    prior = set(dl._snapshot_state(table, version - 1)[0]) if version else set()
    total = 0
    for a in dl._read_actions(table, version):
        if "add" not in a:
            continue
        if a["add"]["path"] not in prior:
            total += a["add"].get("size", 0)
        dv = a["add"].get("deletionVector")
        if dv:
            total += dv.get("sizeInBytes", 0)
    return total


def main() -> None:
    spark = get_spark(app_name="bench_dim_publish")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in (1_000_000, 4_000_000):
        base = _dim(spark, n)
        legs = {}
        # baseline: the pre-r11 full overwrite
        d = tempfile.mkdtemp(prefix="dimpub_ow_")
        try:
            dl.write_delta_table(base.repartitionByRange(N_FILES, "k"), d)
            t0 = time.time()
            v = dl.write_delta_table(
                base.repartitionByRange(N_FILES, "k"), d, mode="overwrite"
            )
            legs["overwrite"] = {
                "wall": round(time.time() - t0, 3),
                "files_rewritten": N_FILES,
                "bytes_written": _bytes_written(d, v),
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
        scattered_src = base.withColumn(
            "bal",
            F.when(F.col("k") % (n // N_CHANGES) == 0, F.col("bal") + 1)
            .otherwise(F.col("bal")).cast("decimal(18,4)"),
        )
        # round 12: the UPSERT cadence (delete_unmatched_source=False)
        # carries only the churn — the diff's target scan is
        # stats-pruned to the files the source's key range can touch,
        # so the localized leg reads O(locality) files, not the dim
        local_delta = _dim(spark, N_CHANGES).withColumn(
            "bal", (F.col("bal") + 1).cast("decimal(18,4)")
        )
        scattered_delta = base.filter(
            F.col("k") % (n // N_CHANGES) == 0
        ).withColumn("bal", (F.col("bal") + 1).cast("decimal(18,4)"))
        for leg, src, full_sync in (
            (
                "inserts_only",
                base.unionByName(
                    _dim(spark, N_CHANGES).withColumn(
                        "k", F.col("k") + 2 * n
                    )
                ),
                True,
            ),
            (
                "localized_updates",
                base.withColumn(
                    "bal",
                    F.when(F.col("k") < N_CHANGES, F.col("bal") + 1)
                    .otherwise(F.col("bal")).cast("decimal(18,4)"),
                ),
                True,
            ),
            ("scattered_updates", scattered_src, True),
            ("scattered_updates_dv", scattered_src, True),
            ("localized_upsert", local_delta, False),
            ("scattered_upsert", scattered_delta, False),
            (
                # churn at the two EXTREMES of the key space: the range
                # test alone keeps every file; the histogram refinement
                # prunes the span between the clusters (round 12)
                "two_cluster_upsert",
                base.filter(
                    (F.col("k") < N_CHANGES // 2)
                    | (F.col("k") >= n - N_CHANGES // 2)
                ).withColumn("bal", (F.col("bal") + 1).cast("decimal(18,4)")),
                False,
            ),
        ):
            d = tempfile.mkdtemp(prefix=f"dimpub_{leg}_")
            try:
                dl.write_delta_table(
                    base.repartitionByRange(N_FILES, "k"), d
                )
                t0 = time.time()
                res = dl.merge_dim_deltalog(
                    spark, d, src, ["k"],
                    delete_unmatched_source=full_sync,
                    deletion_vectors=leg.endswith("_dv"),
                )
                legs[leg] = {
                    "wall": round(time.time() - t0, 3),
                    "files_rewritten": res["files_removed"],
                    "files_dv": res.get("files_dv", 0),
                    "files_kept": res["files_kept"],
                    "files_diff_scanned": res.get("files_diff_scanned"),
                    "files_pruned": res.get("files_pruned"),
                    "bytes_written": (
                        _bytes_written(d, res["version"])
                        if res["version"] is not None
                        else 0
                    ),
                }
            finally:
                shutil.rmtree(d, ignore_errors=True)
        if n == 1_000_000:
            # r13 (VERDICT r12 item 2 done-bar): N churn cycles, each an
            # interleaved full-span arrival merge + a localized band
            # merge. Unmaintained, the band's diff scan grows ~one file
            # per cycle (every arrival file intersects every band);
            # with cluster maintenance between cycles the audit fires a
            # range-sorted rewrite once drift crosses the threshold and
            # the band scan returns to O(band).
            for maintained in (False, True):
                d = tempfile.mkdtemp(prefix="dimpub_cyc_")
                try:
                    sparse = base.withColumn("k", F.col("k") * 2)
                    dl.write_delta_table(
                        sparse.repartitionByRange(N_FILES, "k"), d
                    )
                    scans, walls, reclusters = [], [], 0
                    stride = 2 * n // N_CHANGES
                    for cyc in range(5):
                        arrivals = _dim(spark, N_CHANGES).withColumn(
                            "k", F.col("k") * stride + 2 * cyc + 1
                        )
                        dl.merge_dim_deltalog(spark, d, arrivals, ["k"])
                        band = sparse.filter(
                            F.col("k") < 2 * N_CHANGES
                        ).withColumn(
                            "bal", (F.col("bal") + 1).cast("decimal(18,4)")
                        )
                        t0 = time.time()
                        res = dl.merge_dim_deltalog(spark, d, band, ["k"])
                        walls.append(round(time.time() - t0, 3))
                        scans.append(res["files_diff_scanned"])
                        if maintained:
                            m = dl.maintain_clustering_delta(
                                spark, d, ["k"],
                                target_file_rows=(n + 5 * N_CHANGES)
                                // N_FILES,
                            )
                            reclusters += int(m["reclustered"])
                    tag = "maintained" if maintained else "unmaintained"
                    legs[f"churn_cycles_{tag}"] = {
                        "band_walls": walls,
                        "band_files_diff_scanned": scans,
                        "reclusters_fired": reclusters,
                    }
                finally:
                    shutil.rmtree(d, ignore_errors=True)
        out[f"dim_{n}"] = legs
        print(f"# {n}: {json.dumps(legs)}", file=sys.stderr, flush=True)
    print(json.dumps({"n_changes": N_CHANGES, "n_files": N_FILES, **out}))


if __name__ == "__main__":
    main()
