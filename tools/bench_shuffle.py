#!/usr/bin/env python
"""Shuffle-volume profile of the headline queries (round 5).

Wall-clock on local[32] at sf0.1 says little about 100 TB; SHUFFLE
BYTES do — exchanges are the cluster's scarce resource and scale
linearly with data (modulo partial aggregation). This tool executes
each headline query and walks its final ADAPTIVE executed plan
(recursing through query stages, deduplicating JVM nodes so reused
exchanges don't double-count) to total the SQLMetrics that matter at
scale:

- shuffleBytesWritten / shuffleRecordsWritten per Exchange
- spillSize (any operator that spilled)
- rows scanned (leaf numOutputRows) vs rows shuffled — the partial-agg
  compression the plans are designed around

Prints one JSON line; the round-5 table lives in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_loading_scripts_spark.queries import REGISTRY  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "persona_segmentation", "fingerprint_probe_map", "new_fingerprint_insert",
    "merge_full_sync", "update_fact_sentinel", "window_dedup_latest",
    "topk_per_group", "multi_grain_spend_ratio", "pricing_summary_window",
    "industry_spend_share", "dedup_minhash_lsh", "dedup_exact",
    "ann_bruteforce_topk", "text_quality_score", "sessionize_events",
    "rollup_spend_nation_month", "asof_join_last_purchase", "ann_lsh_topk",
    "corpus_prep_e2e", "json_props_extract",
]


def profile(spark, df) -> dict:
    df.collect()
    jvm = spark._jvm
    seen: set[int] = set()
    totals = {
        "shuffle_bytes": 0, "shuffle_records": 0, "spill_bytes": 0,
        "n_exchanges": 0, "rows_scanned": 0,
    }

    def walk(node):
        ident = jvm.java.lang.System.identityHashCode(node)
        if ident in seen:
            return
        seen.add(ident)
        cls = node.getClass().getSimpleName()
        if cls == "ReusedExchangeExec":
            return  # metrics mirror the original exchange
        name = node.nodeName()
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            key, val = kv._1(), kv._2().value()
            if val <= 0:
                continue
            if key == "shuffleBytesWritten":
                totals["shuffle_bytes"] += val
                totals["n_exchanges"] += 1
            elif key == "shuffleRecordsWritten":
                totals["shuffle_records"] += val
            elif key == "spillSize":
                totals["spill_bytes"] += val
            elif key == "numOutputRows" and name.startswith("Scan "):
                totals["rows_scanned"] += val
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls.endswith("QueryStageExec"):
            walk(node.plan())
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next())

    walk(df._jdf.queryExecution().executedPlan())
    return totals


def main() -> None:
    full = "--all" in sys.argv
    spark = get_spark(app_name="bench_shuffle")
    spark.sparkContext.setLogLevel("ERROR")
    if full:
        # registry-wide sweep (VERDICT r5 item 8): profile every
        # registered query, rank by shuffled bytes, and print the
        # top-20 with their bytes-per-record widths — the numbers the
        # CI ratchet (tests/test_plans.py::
        # test_shuffle_width_stays_bounded) pins. Skip the executing/
        # streaming entries, same set the plan sweeps exclude.
        from tests.test_plans import _EXECUTING  # noqa: PLC0415

        names = [n for n in sorted(REGISTRY) if n not in _EXECUTING]
    else:
        names = HEADLINE
    out = {}
    for name in names:
        try:
            out[name] = profile(spark, REGISTRY[name].spark(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    grand = {
        k: sum(v.get(k, 0) for v in out.values() if "error" not in v)
        for k in ("shuffle_bytes", "shuffle_records", "spill_bytes", "rows_scanned")
    }
    if full:
        top = sorted(
            (v.get("shuffle_bytes", 0), n)
            for n, v in out.items()
            if "error" not in v
        )[-20:][::-1]
        for b, n in top:
            rec = out[n].get("shuffle_records", 0)
            width = b / rec if rec else 0
            print(
                f"# TOP {n}: {b / 1e6:.2f} MB, {rec} rec, "
                f"{width:.0f} B/rec",
                file=sys.stderr,
            )
    print(json.dumps({"sf_dir": SF_DIR, "totals": grand, "queries": out}))


if __name__ == "__main__":
    main()
