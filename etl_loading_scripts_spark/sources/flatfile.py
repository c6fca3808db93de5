"""Flat-file (CSV) loading under the correctness gate.

The reference repo is literally a set of LOADING scripts: typed columns
arrive from vendor extracts and land in warehouse tables (SURVEY §1.2 —
schemas declared, never inferred). This module puts that path under the
driver's oracle: a CSV extract is materialized from the canonical data,
three malformed lines are injected, and the PERMISSIVE-with-quarantine
reader (:func:`sources.io.read_csv_robust`) must deliver every good row
bit-exactly and every bad line to quarantine — no drops, no aborts.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register
from etl_loading_scripts_spark.sources.io import read_csv_robust

#: Malformed lines injected into the extract: wrong arity, non-numeric
#: key, and a bare garbage token. Injection is part of the QUERY (not a
#: fixture) so the quarantine count is oracle-checkable as a constant.
_BAD_LINES = [
    "not_a_number,12.5,A",
    "42,extra,fields,here,oops",
    "garbage",
]

_CSV_SCHEMA = "l_orderkey BIGINT, l_quantity DOUBLE, l_returnflag STRING"


@register(
    "csv_ingest_quarantine",
    oracle=f"""
    SELECT l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY 1
    UNION ALL
    SELECT '__quarantined__', CAST({len(_BAD_LINES)} AS BIGINT),
           CAST(NULL AS DOUBLE)
    """,
    doc="Typed CSV load with quarantine: lineitem exported to a CSV "
    "extract, three malformed lines injected, re-ingested PERMISSIVE "
    "against the declared schema — good rows roll up bit-identically to "
    "the parquet truth (double quantities survive the text round-trip), "
    "malformed lines are counted in quarantine rather than dropped or "
    "fatal. The loading-scripts path itself, under the hash gate.",
)
def csv_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: CSV scan + hash aggregate, fully parallel over file splits
    (CSV is splittable uncompressed); the PERMISSIVE parse costs one
    extra string column only on malformed lines. The cached single scan
    serves both the good rollup and the quarantine count — the same
    one-pass discipline as the JSONL path. Round-trip note: Spark writes
    doubles as shortest-repr decimal strings, which parse back to the
    identical IEEE value, so the decimal-exact SUM matches the parquet
    oracle bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    extract = os.path.join(
        tempfile.gettempdir(),
        f"csv_extract_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    li.write.mode("overwrite").csv(extract)
    with open(os.path.join(extract, "part-99999-injected.csv"), "w") as fh:
        fh.write("\n".join(_BAD_LINES) + "\n")

    good, bad = read_csv_robust(spark, extract, _CSV_SCHEMA)
    rollup = good.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
    )
    quarantined = bad.agg(
        F.lit("__quarantined__").alias("flag"),
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(None).cast("double").alias("sum_qty"),
    )
    return rollup.unionByName(quarantined)


#: Corrupt JSONL lines injected by the query: truncated object, wrong
#: type for a declared column, and non-JSON garbage.
_BAD_JSONL = [
    '{"doc_id": 123, "text": "unterminated',
    '{"doc_id": "not_a_number", "text": "x", "source": "srcX", "n_chars": 1}',
    "plain text, not json at all",
]

_JSONL_SCHEMA = "doc_id BIGINT, text STRING, source STRING, n_chars BIGINT"


@register(
    "jsonl_ingest_quarantine",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(length(text)) AS BIGINT) AS n_text_chars
    FROM documents GROUP BY 1
    UNION ALL
    SELECT '__quarantined__', CAST({len(_BAD_JSONL)} AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    """,
    doc="JSONL corpus ingest with quarantine — JSON-Lines is THE "
    "interchange format of LLM training corpora (one document object "
    "per line): documents exported to a JSONL extract, three corrupt "
    "lines injected (truncated object, type mismatch on a declared "
    "column, non-JSON garbage), re-ingested PERMISSIVE against the "
    "declared schema; good docs roll up bit-identically to the parquet "
    "truth and corrupt lines are counted in quarantine, never dropped "
    "silently or fatal.",
)
def jsonl_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: JSONL is line-splittable, so the scan parallelizes over
    file splits exactly like CSV; schema is DECLARED (no inference pass
    over 100 TB) and the corrupt-record column exists only for rows
    that fail the parse. A type mismatch on a declared column nulls the
    whole row into quarantine (Spark PERMISSIVE semantics) — counted,
    inspectable, re-processable after the upstream fix."""
    from etl_loading_scripts_spark.sources.io import read_jsonl_robust

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    extract = os.path.join(
        tempfile.gettempdir(),
        f"jsonl_extract_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    docs.write.mode("overwrite").json(extract)
    with open(os.path.join(extract, "part-99999-injected.json"), "w") as fh:
        fh.write("\n".join(_BAD_JSONL) + "\n")

    good, bad = read_jsonl_robust(spark, extract, _JSONL_SCHEMA)
    rollup = good.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.sum(F.length("text")).cast("bigint").alias("n_text_chars"),
    )
    quarantined = bad.agg(
        F.lit("__quarantined__").alias("source"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.lit(None).cast("bigint").alias("n_chars"),
        F.lit(None).cast("bigint").alias("n_text_chars"),
    )
    return rollup.unionByName(quarantined)
