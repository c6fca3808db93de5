#!/usr/bin/env python
"""ANN index under DRIFT: the skew→recall/cost curve (round 11,
VERDICT r10 item 5).

Appends route arrivals through the FIXED build-time centroids
(llm/annindex.py), so a drifting embedding distribution concentrates
cells without any failure signal. This tool plants increasing drift —
m jittered replicas of the lowest centroid's cell members appended
through the normal maintenance path — and measures, per drift level:

- imbalance factor (max cell / uniform ideal) and probe-cost factor
  from the STORED index's log stats (index_balance_report);
- recall@10 of the rank-1 probe against the UNDRIFTED brute-force
  ground truth (original vectors only — the drift must not displace a
  query's true original-corpus neighbors);
- per-query candidate volume: mean and max probed-cell population
  (the latency a query landing in the hot cell pays).

The REBUILD_IMBALANCE_FACTOR threshold in llm/annindex.py is chosen
from this curve; the table lives in SCALING.md r11. Prints ONE JSON
line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_loading_scripts_spark.catalog import load_table  # noqa: E402
from etl_loading_scripts_spark.llm import annindex as ai  # noqa: E402
from etl_loading_scripts_spark.llm.similarity import (  # noqa: E402
    N_QUERIES,
    TOP_K,
    _cosine_expr,
    _quantized,
)
from etl_loading_scripts_spark.operators.deltalog import (  # noqa: E402
    read_delta_table,
)
from etl_loading_scripts_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DRIFT_LEVELS = [0, 1, 3, 7]


def _brute_topk(n):
    """Exact cosine top-k over the ORIGINAL corpus for the query ids."""
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qa"),
        F.col("norm2").alias("na"),
    )
    from pyspark.sql import Window

    scored = (
        n.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("qv").alias("qb"),
            F.col("norm2").alias("nb"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _cosine_expr("qa", "qb", "na", "nb"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )


def main() -> None:
    spark = get_spark()
    emb = load_table(spark, SF_DIR, "embeddings")
    n = _quantized(emb).select("vec_id", "qv", "norm2")
    exact = _brute_topk(n).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    rows = []
    for m in DRIFT_LEVELS:
        root = tempfile.mkdtemp(prefix=f"ann_drift_m{m}_")
        try:
            ai.ann_index_build(spark, emb, root)
            cells = read_delta_table(spark, os.path.join(root, ai.CELLS))
            c0 = cells.agg(F.min("centroid_id")).first()[0]
            members = emb.join(
                cells.filter(F.col("centroid_id") == c0).select("vec_id"),
                "vec_id", "left_semi",
            )
            def _jitter(level):
                # per-level jitter DIRECTION so the arrivals are NEW
                # vectors near the hot cell (drift, not duplication) —
                # and geometrically separable by a re-trained rule
                return lambda x, j: x + ((j * level) % 7 - 3) * 0.003

            for i in range(1, m + 1):
                ai.ann_index_append(
                    spark,
                    members.select(
                        (F.col("vec_id") + F.lit(10_000_000 * i)).alias("vec_id"),
                        F.col("label"),
                        F.transform("embedding", _jitter(i)).alias("embedding"),
                    ),
                    root,
                )
            report = ai.index_balance_report(spark, root).first().asDict()
            sizes = {
                r.centroid_id: r.cell_size
                for r in ai.index_cell_sizes(spark, root).collect()
            }
            # probe from the drifted index; recall against ORIGINAL truth
            queries = n.filter(F.col("vec_id") < N_QUERIES)
            out, _ = ai.ann_index_probe(
                spark, queries, root, k=TOP_K + 4 * m, return_probed=True
            )
            got = out.filter(F.col("neighbor_id") < 10_000_000).collect()
            per_q = {}
            for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
                per_q.setdefault(r.query_id, [])
                if len(per_q[r.query_id]) < TOP_K:
                    per_q[r.query_id].append(r.neighbor_id)
            hits = sum(
                len(set(per_q.get(qid, [])) & tr) for qid, tr in truth.items()
            )
            total = sum(len(tr) for tr in truth.items() and truth.values())
            # candidate volume per query = its probed cell's population
            from etl_loading_scripts_spark.llm.annindex import _assign_top_p, _cents

            probed = _assign_top_p(
                queries, _cents(root, spark), 1
            ).select("vec_id", "centroid_id").collect()
            cand = [sizes[r.centroid_id] for r in probed]
            entry = {
                "drift_copies": m,
                "imbalance_factor": round(report["imbalance_factor"], 3),
                "probe_cost_factor": round(report["probe_cost_factor"], 3),
                "rebuild_recommended": int(report["rebuild_recommended"]),
                "recall_at_10": round(hits / total, 3),
                "mean_candidates": round(sum(cand) / len(cand), 1),
                "max_candidates": max(cand),
                "hot_cell": int(report["max_cell"]),
            }
            if report["rebuild_recommended"]:
                # act on the recommendation: atomic in-place re-train
                post = ai.ann_index_rebuild(spark, root)
                entry["post_rebuild"] = {
                    "imbalance_factor": round(post["imbalance_factor"], 3),
                    "probe_cost_factor": round(post["probe_cost_factor"], 3),
                    "rebuild_recommended": int(post["rebuild_recommended"]),
                    "n_cells": int(post["n_cells"]),
                }
            rows.append(entry)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"sf_dir": SF_DIR, "levels": rows}))


if __name__ == "__main__":
    main()
