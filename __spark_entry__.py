"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship query (persona segmentation cascade) at sf0.001.
``queries`` — every implemented operator from SURVEY §2 + the LLM-pipeline
              extension operators, as (spark, sf_dir) -> DataFrame callables.
``oracle_sql`` — the DuckDB-equivalent SQL per query (omitted only for
              genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_loading_scripts_spark.queries import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "persona_segmentation"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (same column aliases as the Spark side)."""
    return {name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle is not None}
