#!/usr/bin/env python
"""Capture .explain("formatted") for a set of registered queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (guide §1: measure first, keep the plans).

Usage: python tools/capture_plans.py TAG SUFFIX [query ...]
       (no queries = the bench HEADLINE set)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from etl_loading_scripts_spark.queries import REGISTRY  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        df = q.spark(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n\n{txt}")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
