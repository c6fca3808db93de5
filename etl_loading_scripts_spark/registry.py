"""Query registry plumbing for the driver contract (``__spark_entry__.py``).

Every operator claimed as implemented gets a named entry here: a Spark
callable ``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, the
equivalent DuckDB oracle SQL (run by the driver side-by-side at sf0.01).

Cross-engine determinism rules used throughout (see SURVEY §7.4 R2/R7):

- **Money math is exact**: inputs are cast to ``DECIMAL(18,4)`` before SUM so
  both engines aggregate exactly; final presentation casts the identical
  decimal to DOUBLE. Never hash a floating-point *sum* (order-dependent).
- **Ratios** divide the exact components as doubles — identical inputs →
  identical IEEE result in both engines.
- **Counts** are BIGINT on both sides (DuckDB ``SUM(int)`` returns HUGEINT →
  always ``CAST(... AS BIGINT)`` in oracle SQL).
- **No timestamps in outputs** (Arrow tz mismatch) — cast to DATE or datekey.
- **Ties** in any top-k / rank are broken by a unique key column.
- **Hashes** are md5-hex over UTF-8 (DuckDB has no sha1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a Spark query with its DuckDB oracle."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap
