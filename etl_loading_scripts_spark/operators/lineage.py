"""Dataset-level lineage capture — provenance from the resolved plan.

Every governed warehouse wants, for each job run: WHICH physical inputs
were read, at what grain, producing HOW many rows (the OpenLineage /
Unity-Catalog lineage event). Spark's resolved logical plan already
knows: :meth:`DataFrame.inputFiles` enumerates the exact files the scan
set resolved to — no instrumentation, no log scraping, and it works for
ANY registered query because lineage comes from the plan, not from
hand-maintained metadata.

``capture_lineage`` is the primitive; ``lineage_audit`` registers a
driver-checkable audit over three representative queries, whose oracle
is COMPOSED from those queries' own DuckDB oracles (row counts) plus
the physical table layout — so a plan change that silently starts
reading an extra table (a lost pushdown, an accidental join) breaks
the hash.

Reference behavior modeled: the reference tracks loads via row-count
logging inside procedures (`SURVEY §4`, validation COUNT(*) pattern);
this is the plan-derived generalization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_loading_scripts_spark.registry import REGISTRY, register


def capture_lineage(df: DataFrame, name: str) -> dict:
    """One lineage record for a finished DataFrame: distinct input
    table names (file basenames sans extension), file count, and output
    row count. ``inputFiles`` comes from the resolved scan set —
    partition-pruned files are already excluded, so the record reflects
    what a run would actually read."""
    files = df.inputFiles()
    tables = sorted(
        {os.path.basename(f).split(".")[0].split("-")[0] for f in files}
    )
    return {
        "query_name": name,
        "input_tables": ",".join(tables),
        "n_input_files": len(files),
        "n_rows_out": df.count(),
    }


_AUDITED = [
    # query -> the tables its plan must (and must only) read
    ("pricing_summary_window", ["lineitem"]),
    ("top_n_inspection", ["lineitem"]),
    ("persona_segmentation", ["customer", "orders"]),
    ("count_distinct_clients", ["orders"]),
]


def _lineage_oracle() -> str:
    parts = []
    for name, tables in _AUDITED:
        inner = REGISTRY[name].oracle
        parts.append(
            f"""
    SELECT '{name}' AS query_name,
           '{",".join(sorted(tables))}' AS input_tables,
           CAST({len(tables)} AS INT) AS n_input_files,
           CAST((SELECT COUNT(*) FROM ({inner}) __q) AS BIGINT) AS n_rows_out
    """
        )
    return " UNION ALL ".join(parts)


@register(
    "lineage_audit",
    oracle=_lineage_oracle(),
    doc="Plan-derived lineage audit: for three representative queries, "
    "the resolved scan set's table list and file count plus the output "
    "row count — oracle COMPOSED from those queries' own DuckDB "
    "oracles, so a plan that silently reads an extra table (lost "
    "pruning, accidental join) or changes its result cardinality "
    "hash-mismatches. n_input_files equals the table count at this "
    "test layout (one parquet file per table); at production scale it "
    "counts pruned-surviving files per table.",
)
def lineage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: lineage costs one plan walk (driver-side metadata) plus
    the count the audit wants anyway; the record is O(files), collected
    exactly like every lakehouse lineage emitter does."""
    records = [
        capture_lineage(REGISTRY[name].spark(spark, sf_dir), name)
        for name, _ in _AUDITED
    ]
    return spark.createDataFrame(
        [
            (r["query_name"], r["input_tables"], r["n_input_files"], r["n_rows_out"])
            for r in records
        ],
        "query_name string, input_tables string, n_input_files int, n_rows_out long",
    )
