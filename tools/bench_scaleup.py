#!/usr/bin/env python
"""Scale-slope measurement: amplify the sf0.1 fixture 4x (key-offset
copies, per-copy text perturbation) into a synthetic ~sf0.4 directory and
compare headline-query wall time against sf0.1.

The number that matters for the 100 TB claim is the SLOPE: a query whose
cost grows ~linearly with data (ratio ~<= amplification factor) has no
hidden superlinear term (candidate explosion, driver collect, global
sort); a superlinear ratio is a scale bug this tool exists to catch.
Dims (region/nation/supplier/part) stay single-copy -- at 100 TB the
dimensions grow far slower than facts, which is also what keeps them
broadcastable.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_loading_scripts_spark.queries import REGISTRY
from etl_loading_scripts_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/sf0.4x"
COPIES = 4

QUERIES = [
    "pricing_summary_window",
    "rollup_spend_nation_month",
    "topk_per_group",
    "window_dedup_latest",
    "sessionize_events",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_lsh_topk",
    "asof_join_last_purchase",
    "persona_segmentation",
    "update_fact_sentinel",
]

# (table, [key columns to offset]) -- offsets keep PK/FK consistent
AMPLIFIED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "supplier", "part"]


def amplify(spark):
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for t in DIMS:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t, keys in AMPLIFIED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        maxes = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
        parts = []
        for c in range(COPIES):
            p = df
            for k in keys:
                p = p.withColumn(k, (F.col(k) + c * maxes[k]).cast(dict(df.dtypes)[k]))
            if t == "documents" and c > 0:
                # perturb text so copies are near-dups, not byte-dups --
                # keeps the LSH candidate structure realistic
                p = p.withColumn("text", F.concat(F.col("text"), F.lit(f" copyv{c}")))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.coalesce(8).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def run(spark, sf_dir, name):
    q = REGISTRY[name]
    best = None
    for _ in range(3):
        t0 = time.time()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main():
    spark = get_spark(app_name="bench_scaleup")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    amplify(spark)
    out = {}
    for name in QUERIES:
        REGISTRY[name].spark(spark, "/root/testdata/sf0.001").count()  # warm plans
        t1 = run(spark, SRC, name)
        t4 = run(spark, DST, name)
        out[name] = {"sf0.1": t1, "sf0.4x": t4, "ratio": round(t4 / t1, 2)}
        print(f"{name}: {t1}s -> {t4}s  ratio {out[name]['ratio']}x", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
