"""Deterministic sampling / data-mixture operators for training corpora.

Training-data pipelines don't use ``rand()`` — a resumable 100 TB job needs
sampling that is a pure function of the row, so re-runs, backfills, and
per-engine audits agree row-for-row. The standard trick: hash a stable key
and compare against a rate threshold (Bernoulli) or rank within a stratum
(exact-size). Both are expressible as codegen'd expressions and are
bit-identical across engines.

- ``sample_hash_rate`` — per-source Bernoulli rates via md5-prefix
  threshold compare: a FILTER, no shuffle, no state. The 100 TB path.
- ``sample_mixture_topk`` — exact K docs per source by hash rank: the
  "data mixture" recipe (N_src documents per source per epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.queries.base import register

#: Per-mixture-bucket sampling rates (bucket = source number mod 3).
MIX_RATES = {0: 0.8, 1: 0.4, 2: 0.1}


def _rate_hex(rate: float) -> str:
    """8-hex-digit threshold: md5-prefix < this ⇔ keep with ~`rate`."""
    return format(int(rate * 16**8), "08x")


_RATE_CASE_SQL = "CASE " + " ".join(
    f"WHEN CAST(substr(source, 4) AS INT) % 3 = {b} THEN '{_rate_hex(r)}'"
    for b, r in MIX_RATES.items()
) + " END"

#: Exact per-source document budget for the mixture (K per stratum).
MIX_K = 8


@register(
    "sample_hash_rate",
    oracle=f"""
    SELECT doc_id, source,
           CAST(CAST(substr(source, 4) AS INT) % 3 AS BIGINT) AS mix_bucket
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {_RATE_CASE_SQL}
    """,
    doc="Deterministic Bernoulli sampling at per-source rates: keep iff "
    "md5(doc_id) prefix < the source's rate threshold. A pure filter — "
    "reproducible across re-runs/backfills/engines, zero shuffle, and "
    "the sampled fraction converges to the configured mixture weights.",
)
def sample_hash_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the predicate is a scan-side filter (codegen, no state, no
    shuffle) — the ONLY sampling shape that survives 100 TB unchanged.
    Rates are literals compiled into the plan; changing the mixture is a
    recompile, not a reshuffle."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr("cast(substr(source, 4) as int) % 3")
    threshold = F.expr(
        "CASE "
        + " ".join(
            f"WHEN cast(substr(source, 4) as int) % 3 = {b} THEN '{_rate_hex(r)}'"
            for b, r in MIX_RATES.items()
        )
        + " END"
    )
    return (
        docs.filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < threshold)
        .select("doc_id", "source", bucket.cast("long").alias("mix_bucket"))
    )


@register(
    "sample_mixture_topk",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS hash_rank
        FROM documents
    )
    SELECT doc_id, source, CAST(hash_rank AS BIGINT) AS hash_rank
    FROM ranked WHERE hash_rank <= {MIX_K}
    """,
    doc=f"Exact data mixture: the {MIX_K} lowest-hash documents per source "
    "— a seeded uniform without-replacement draw whose membership is a "
    "pure function of the data, so every epoch/backfill sees the same "
    "sample.",
)
def sample_mixture_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size per-stratum draw via hash rank.

    Scale: the window partitions by source — with K tiny, Spark's
    window-group-limit pushdown (rank filter) truncates each partition's
    sort to the top K rather than ranking the whole stratum; for whale
    strata pre-filter with :func:`sample_hash_rate` at a margin above
    K/N first, then rank the survivors."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).cast("long").alias("hash_rank")
        )
        .filter(F.col("hash_rank") <= MIX_K)
    )
