#!/usr/bin/env python
"""Print the physical plan of any registered query.

Usage: python tools/explain_plan.py QUERY [--sf-dir DIR] [--mode MODE]

MODE: formatted (default) | simple | extended | codegen | cost.
``codegen`` disables AQE for the inspection so WholeStageCodegen subtrees
are visible pre-execution (same trick as tests/test_plans.py).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

from etl_loading_scripts_spark.queries import REGISTRY  # noqa: E402
from etl_loading_scripts_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", choices=sorted(REGISTRY), metavar="QUERY")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--mode",
        default="formatted",
        choices=["formatted", "simple", "extended", "codegen", "cost"],
    )
    args = ap.parse_args()

    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    if args.mode == "codegen":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    df = REGISTRY[args.query].spark(spark, args.sf_dir)
    print(
        df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), args.mode)
    )


if __name__ == "__main__":
    main()
