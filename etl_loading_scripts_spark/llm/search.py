"""Full-text relevance search (BM25) as a distributed scan + rank.

The retrieval side of a data pipeline: score every document against a
keyword query with Okapi BM25 and return the top hits. The classic
engine shape is an inverted index; the warehouse shape — one projection
computing per-term term-frequencies, one tiny global-stats aggregate
(N, Σdl, per-term document frequencies), one broadcast join, one top-k —
is what Spark executes here, and it parallelizes embarrassingly.

Exactness: BM25 is float math, so both engines evaluate the *same*
IEEE-754 expression tree: integer tf/dl/df/N cast to double (exact —
all < 2^53), then only exactly-rounded + * / with identical literals and
parenthesization. No logarithm: the idf is kept as the exact rational
``(N - df + 0.5) / (df + 0.5)`` (the log is monotone in it, so rankings
match the textbook formula; the same trick the exact-ratio tf-idf query
uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

#: The fixed keyword query (terms known to appear in the synthetic corpus).
QUERY_TERMS = ("join", "filter", "hash")

TOP_K = 15

#: Okapi parameters as literals so both engines parse identical doubles.
K1 = "1.2"
K1_PLUS_1 = "2.2"
ONE_MINUS_B = "0.25"
B = "0.75"


def _score_sql(terms=QUERY_TERMS) -> str:
    """The BM25 sum — engine-neutral SQL over columns tf_<t>, df_<t>,
    n_docs, avgdl, dl. Fixed left-to-right addition order."""
    parts = []
    for t in terms:
        idf = (
            f"((CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{t} AS DOUBLE) + 0.5))"
        )
        num = f"(CAST(tf_{t} AS DOUBLE) * {K1_PLUS_1})"
        den = (
            f"(CAST(tf_{t} AS DOUBLE) + {K1} * ({ONE_MINUS_B}"
            f" + {B} * (CAST(dl AS DOUBLE) / avgdl)))"
        )
        parts.append(f"{idf} * ({num} / {den})")
    score = parts[0]
    for p in parts[1:]:
        score = f"({score} + {p})"
    return score


_TF_DUCK = "len(list_filter(words, w -> w = '{t}'))"
_TF_SPARK = "size(filter(words, w -> w = '{t}'))"


@register(
    "bm25_search",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\W+'),
                           w -> w <> '') AS words
        FROM documents
    ),
    tf AS (
        SELECT doc_id, len(words) AS dl,
               {", ".join(f"{_TF_DUCK.format(t=t)} AS tf_{t}" for t in QUERY_TERMS)}
        FROM toks
    ),
    stats AS (
        SELECT count(*) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
               {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in QUERY_TERMS)}
        FROM tf
    )
    SELECT doc_id, dl,
           {", ".join(f"tf_{t}" for t in QUERY_TERMS)},
           {_score_sql()} AS score
    FROM tf CROSS JOIN stats
    ORDER BY score DESC, doc_id
    LIMIT {TOP_K}
    """,
    doc=f"Okapi BM25 top-{TOP_K} for the fixed query {QUERY_TERMS}: "
    "per-doc term frequencies, one global-stats row (N, avgdl, dfs), "
    "exact-rational idf — both engines evaluate the identical IEEE "
    "expression, so scores are bit-equal.",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: tokenize+tf is a codegen projection (no shuffle); the stats
    aggregate is one map-side-combined reduction to a single broadcast
    row; scoring is another projection; top-k is TakeOrderedAndProject
    (per-partition heaps, no global sort). An inverted index only wins
    when queries vastly outnumber scans — for batch re-ranking over a
    corpus this IS the right plan."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.expr(r"filter(split(lower(text), '\\W+'), w -> w <> '')")
    tf = docs.select("doc_id", words.alias("words")).select(
        "doc_id",
        F.size(F.col("words")).alias("dl"),
        *[
            F.expr(_TF_SPARK.format(t=t)).alias(f"tf_{t}")
            for t in QUERY_TERMS
        ],
    )
    # One tokenize pass feeds both the stats row and the scoring scan.
    tf = tf.localCheckpoint()
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in QUERY_TERMS
        ],
    )
    return (
        tf.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            *[f"tf_{t}" for t in QUERY_TERMS],
            F.expr(_score_sql()).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(TOP_K)
    )
