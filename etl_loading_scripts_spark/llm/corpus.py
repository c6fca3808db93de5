"""The end-to-end training-corpus preparation pipeline as ONE dataflow.

Composes the LLM-data operators the way a real pretraining pipeline chains
them — quality gate → exact dedup → near-dedup → token accounting — and
emits per-(lang, source) corpus statistics. This is the flagship
"capabilities composed" query: every stage is an operator that also exists
standalone (``llm/text.py``, ``llm/dedup.py``).

Near-dup removal uses the greedy keep-min rule: a doc is dropped if it is
the larger id of ANY verified near-dup pair. One pass, no iteration, keeps
≥1 doc per duplicate cluster (the cluster minimum always survives);
``dedup_clusters`` is the exact-component variant when cluster membership
itself is the product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.llm.dedup import _MINHASH_ORACLE, dedup_minhash_lsh
from etl_loading_scripts_spark.llm.text import _words_col
from etl_loading_scripts_spark.registry import register

MIN_WORDS = 20
STOP_LO, STOP_HI = 0.01, 0.5
_EN_SQL = "['the','a','of','and','to','in','is']"


@register(
    "corpus_prep_e2e",
    oracle=rf"""
    WITH near_pairs AS (
        {_MINHASH_ORACLE}
    ),
    quality AS (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(list_filter(words, x -> list_contains({_EN_SQL}, x))) AS DOUBLE)
                   / len(words) AS stop_ratio
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS words
            FROM documents
        )
        WHERE len(words) > 0
    ),
    q_keep AS (
        SELECT doc_id FROM quality
        WHERE n_words >= {MIN_WORDS} AND stop_ratio BETWEEN {STOP_LO} AND {STOP_HI}
    ),
    exact_keep AS (
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        WHERE doc_id IN (SELECT doc_id FROM q_keep)
        GROUP BY md5(text)
    ),
    near_drop AS (
        SELECT DISTINCT id_b AS doc_id FROM near_pairs
    ),
    final AS (
        SELECT doc_id FROM exact_keep
        WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
    )
    SELECT d.lang, d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(ceil(d.n_chars / 4.0) AS BIGINT)) AS BIGINT) AS n_tokens_approx,
           CAST(MIN(d.doc_id) AS BIGINT) AS min_doc_id
    FROM documents d JOIN final f ON d.doc_id = f.doc_id
    GROUP BY 1, 2
    """,
    doc="Corpus prep end-to-end: stopword/length quality gate → exact "
    "dedup (keep min per content hash) → near-dedup (greedy keep-min over "
    "MinHash-LSH pairs) → per-(lang, source) doc and token accounting.",
)
def corpus_prep_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the quality gate and content hash are map-only over the
    corpus scan; exact dedup is one shuffle on the hash; the near-dup drop
    list comes from the LSH pair graph (bucket-bounded) and broadcasts —
    at 100 TB the whole prep is three bounded shuffles, no iteration, and
    every stage prunes the next stage's input."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", _words_col().alias("words")).filter(
        F.size("words") > 0
    )
    en = "array('the','a','of','and','to','in','is')"
    quality = words.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        (
            F.size(F.expr(f"filter(words, x -> array_contains({en}, x))")).cast("double")
            / F.size("words")
        ).alias("stop_ratio"),
    )
    q_keep = quality.filter(
        (F.col("n_words") >= MIN_WORDS)
        & F.col("stop_ratio").between(STOP_LO, STOP_HI)
    ).select("doc_id")

    exact_keep = (
        docs.join(q_keep, "doc_id")
        .groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    near_drop = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    final = exact_keep.join(F.broadcast(near_drop), "doc_id", "left_anti")

    return (
        docs.join(final, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.ceil(F.col("n_chars") / 4.0).cast("long")).alias("n_tokens_approx"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
