"""Text-analysis operators over the ``documents`` table.

Language ID (function-word n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting
(k-gram winnowing-lite). All pure built-in expressions — these run inside
whole-stage codegen on the JVM; no Python touches the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

#: Function-word lists per language for the n-gram language heuristic.
#: (Real pipelines use fastText/CLD3; the heuristic keeps the operator
#: dependency-free and oracle-checkable.)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "los", "en", "un"],
    "fr": ["le", "la", "les", "de", "et", "un", "une"],
    "de": ["der", "die", "das", "und", "ein", "zu", "ist"],
}

_WORDS = "filter(split(lower(text), '\\\\W+'), w -> w <> '')"


def _words_col():
    return F.expr(_WORDS)


@register(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_filter(string_split_regex(lower(text), '\W+'),
                                w -> w <> '')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_approx
    FROM documents
    """,
    doc="Token counting: whitespace words, alpha-token regex (BPE-ish "
    "pre-tokenizer shape), and the chars/4 LLM-token heuristic.",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: embarrassingly parallel projection — no shuffle at all; the
    regexes run codegen'd per partition."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(_words_col()).cast("long").alias("n_words"),
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .cast("long")
        .alias("n_alpha_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_tokens_approx"),
    )


_EN_LIST_SQL = "['the','a','of','and','to','in','is']"


@register(
    "text_quality_score",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id, n_chars,
               list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS words
        FROM documents
    ),
    m AS (
        SELECT doc_id, n_chars,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(list_filter(words, x -> list_contains({_EN_LIST_SQL}, x))) AS BIGINT) AS n_stop,
               CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS sum_word_len
        FROM w
    )
    SELECT doc_id, n_words,
           CAST(sum_word_len AS DOUBLE) / n_words AS mean_word_len,
           CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
           CASE WHEN n_words >= 20
                 AND CAST(n_stop AS DOUBLE) / n_words BETWEEN 0.01 AND 0.5
                THEN 'keep' ELSE 'flag' END AS quality_bucket
    FROM m WHERE n_words > 0
    """,
    doc="Quality scoring: length / stopword-ratio / mean-word-length heuristics "
    "with a keep/flag bucket — the C4/Gopher-style rule family.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    en = "array('the','a','of','and','to','in','is')"
    w = docs.select(
        "doc_id",
        "n_chars",
        _words_col().alias("words"),
    )
    m = w.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.size(F.expr(f"filter(words, x -> array_contains({en}, x))"))
        .cast("long")
        .alias("n_stop"),
        F.expr("aggregate(words, 0L, (acc, x) -> acc + length(x))")
        .cast("long")
        .alias("sum_word_len"),
    )
    return m.filter(F.col("n_words") > 0).select(
        "doc_id",
        "n_words",
        (F.col("sum_word_len").cast("double") / F.col("n_words")).alias("mean_word_len"),
        (F.col("n_stop").cast("double") / F.col("n_words")).alias("stopword_ratio"),
        F.when(
            (F.col("n_words") >= 20)
            & (F.col("n_stop").cast("double") / F.col("n_words")).between(0.01, 0.5),
            F.lit("keep"),
        )
        .otherwise(F.lit("flag"))
        .alias("quality_bucket"),
    )


def _lang_hits_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"len(list_filter(words, x -> list_contains([{words}], x)))"


def _lang_hits_spark(lang: str):
    words = ",".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return F.size(F.expr(f"filter(words, x -> array_contains(array({words}), x))"))


@register(
    "text_language_id",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id, lang AS labeled_lang,
               list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS words
        FROM documents
    ),
    scored AS (
        SELECT doc_id, labeled_lang,
               CAST({_lang_hits_sql('en')} AS BIGINT) AS en_hits,
               CAST({_lang_hits_sql('es')} AS BIGINT) AS es_hits,
               CAST({_lang_hits_sql('fr')} AS BIGINT) AS fr_hits,
               CAST({_lang_hits_sql('de')} AS BIGINT) AS de_hits
        FROM w
    )
    SELECT doc_id, labeled_lang, en_hits, es_hits, fr_hits, de_hits,
           CASE GREATEST(en_hits, es_hits, fr_hits, de_hits)
                WHEN 0 THEN 'und'
                WHEN en_hits THEN 'en'
                WHEN es_hits THEN 'es'
                WHEN fr_hits THEN 'fr'
                ELSE 'de' END AS pred_lang
    FROM scored
    """,
    doc="Language ID: function-word hit counts per candidate language, "
    "argmax with deterministic tie order (en>es>fr>de), 'und' when no hits.",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"), _words_col().alias("words")
    )
    scored = w.select(
        "doc_id",
        "labeled_lang",
        *[
            _lang_hits_spark(lang).cast("long").alias(f"{lang}_hits")
            for lang in ("en", "es", "fr", "de")
        ],
    )
    best = F.greatest("en_hits", "es_hits", "fr_hits", "de_hits")
    pred = (
        F.when(best == 0, "und")
        .when(best == F.col("en_hits"), "en")
        .when(best == F.col("es_hits"), "es")
        .when(best == F.col("fr_hits"), "fr")
        .otherwise("de")
    )
    return scored.withColumn("pred_lang", pred)


@register(
    "text_fingerprint",
    oracle=r"""
    WITH grams AS (
        SELECT doc_id,
               list_sort(list_transform(range(1, length(text) - 3),
                         i -> md5(substr(text, i, 5)))) AS hashes
        FROM documents
        WHERE length(text) >= 5
    )
    SELECT doc_id,
           md5(array_to_string(hashes[1:8], ',')) AS fingerprint,
           CAST(len(hashes) AS BIGINT) AS n_grams
    FROM grams
    """,
    doc="Document fingerprinting (winnowing-lite): md5 over char 5-grams, "
    "keep the bottom-8 sorted hashes, fingerprint = md5 of their concat. "
    "Robust to small edits anywhere outside the 8 minima.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: per-row array expression — no shuffle, no UDF. A 100 TB corpus
    fingerprints in one map-only pass; grouping by fingerprint afterward is
    the usual exact-dedup shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.filter(F.length("text") >= 5).select(
        "doc_id",
        F.array_sort(
            F.expr("transform(sequence(1, length(text) - 4), i -> md5(substring(text, i, 5)))")
        ).alias("hashes"),
    )
    return grams.select(
        "doc_id",
        F.md5(F.concat_ws(",", F.slice("hashes", 1, 8))).alias("fingerprint"),
        F.size("hashes").cast("long").alias("n_grams"),
    )


#: Gopher-style repetition thresholds (Rae et al. 2021 table A1 shape):
#: docs whose most-frequent word exceeds TOP_WORD_FRAC of all words, or
#: whose duplicate-bigram fraction exceeds DUP_BIGRAM_FRAC, are filtered.
#: Values tuned to split the synthetic corpus non-trivially.
TOP_WORD_FRAC = 0.12
DUP_BIGRAM_FRAC = 0.04


@register(
    "doc_repetition_stats",
    oracle=rf"""
    WITH base AS (
        SELECT doc_id, words FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\W+'),
                               w -> w <> '') AS words
            FROM documents)
        WHERE len(words) >= 2
    ),
    perrow AS (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(words) - 1 AS BIGINT) AS n_bigrams,
               CAST(len(list_distinct(list_transform(range(1, len(words)),
                        i -> array_to_string(words[i:i+1], ' ')))) AS BIGINT)
                   AS n_distinct_bigrams
        FROM base
    ),
    top AS (
        SELECT doc_id, MAX(c) AS top_c FROM (
            SELECT doc_id, w, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(words) AS w FROM base)
            GROUP BY doc_id, w)
        GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_words,
           t.top_c / p.n_words AS top_word_frac,
           (p.n_bigrams - p.n_distinct_bigrams) / p.n_bigrams AS dup_bigram_frac,
           (t.top_c / p.n_words <= {TOP_WORD_FRAC}
            AND (p.n_bigrams - p.n_distinct_bigrams) / p.n_bigrams
                <= {DUP_BIGRAM_FRAC}) AS keep
    FROM perrow p JOIN top t USING (doc_id)
    """,
    doc="Intra-document repetition signals (Gopher rule family): "
    "most-frequent-word fraction + duplicate-bigram fraction, with a "
    "keep flag at the configured thresholds.",
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row signals (bigram distinct count) stay in codegen'd array
    expressions; the mode count is the one signal that genuinely needs an
    explode → two co-partitioned groupBys on doc_id. Both branches read the
    same doc_id-partitioned materialization, and the final join is
    doc_id-to-doc_id — at 100 TB everything after the first repartition is
    shuffle-free except the (doc_id, word) combine, whose map-side partial
    aggregation bounds it by per-doc vocabulary, not corpus size.

    Fractions divide exact BIGINTs as doubles — identical IEEE results in
    both engines (cross-engine rule R2)."""
    docs = load_table(spark, sf_dir, "documents")
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = (
        docs.repartition(par, "doc_id")
        .select("doc_id", _words_col().alias("words"))
        .filter(F.size("words") >= 2)
        # materialization barrier before explode (see dedup._shingles_spark)
        .groupBy("doc_id")
        .agg(F.first("words").alias("words"))
    )
    perrow = base.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        (F.size("words") - 1).cast("long").alias("n_bigrams"),
        F.size(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(words) - 1), "
                    "i -> concat_ws(' ', words[i-1], words[i]))"
                )
            )
        )
        .cast("long")
        .alias("n_distinct_bigrams"),
    )
    top = (
        base.select("doc_id", F.explode("words").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    top_frac = F.col("top_c") / F.col("n_words")
    dup_frac = (F.col("n_bigrams") - F.col("n_distinct_bigrams")) / F.col("n_bigrams")
    return perrow.join(top, "doc_id").select(
        "doc_id",
        "n_words",
        top_frac.alias("top_word_frac"),
        dup_frac.alias("dup_bigram_frac"),
        ((top_frac <= TOP_WORD_FRAC) & (dup_frac <= DUP_BIGRAM_FRAC)).alias("keep"),
    )


@register(
    "bpe_top_merges",
    oracle=r"""
    WITH words AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'),
                                  w -> w <> '')) AS w
        FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair
        FROM words WHERE len(w) >= 2
    ),
    counted AS (
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY 1
    )
    SELECT pair, n FROM counted
    ORDER BY n DESC, pair LIMIT 20
    """,
    doc="One BPE training step at corpus scale: the 20 most frequent "
    "adjacent character pairs across all words - the merge candidates "
    "byte-pair-encoding vocabulary induction greedily picks from.",
)
def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed vocabulary induction primitive: each BPE iteration is
    exactly this count-pairs-and-argmax; iterating re-runs it on the
    merged symbol stream. Scale: two Generates feed a (pair) groupBy
    whose map-side partial aggregation bounds the shuffle by alphabet^2,
    not corpus size; the top-20 is a TakeOrderedAndProject over those
    few thousand pair rows."""
    docs = load_table(spark, sf_dir, "documents")
    par = docs.sparkSession.sparkContext.defaultParallelism
    words = (
        docs.repartition(par, "doc_id")
        .select("doc_id", _words_col().alias("words"))
        # materialization barrier before the double explode (see
        # dedup._shingles_spark)
        .groupBy("doc_id")
        .agg(F.first("words").alias("words"))
        .select(F.explode("words").alias("w"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@register(
    "bigram_lm_estimate",
    oracle=r"""
    WITH docs_w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\W+'), w -> w <> '') AS words
        FROM documents
    ),
    bigrams AS (
        SELECT unnest(list_transform(range(1, len(words)),
                      i -> {'w1': words[i], 'w2': words[i+1]})) AS bg
        FROM docs_w WHERE len(words) >= 2
    ),
    c2 AS (
        SELECT bg.w1 AS w1, bg.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS n12
        FROM bigrams GROUP BY 1, 2
    ),
    c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c2 GROUP BY 1)
    SELECT c2.w1, c2.w2, c2.n12, c1.n1,
           c2.n12 / c1.n1 AS cond_prob
    FROM c2 JOIN c1 ON c2.w1 = c1.w1
    ORDER BY c2.n12 DESC, c2.w1, c2.w2 LIMIT 50
    """,
    doc="Bigram language-model estimation: P(w2|w1) = c(w1,w2)/c(w1-) "
    "over the corpus, top-50 bigrams - the classic n-gram LM count "
    "pipeline (KenLM-style step 1) as two co-partitioned aggregations.",
)
def bigram_lm_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: bigram counts shuffle once on (w1, w2) with map-side
    combine (vocabulary-bounded); the denominator is a re-aggregation of
    those counts on w1 (grain-to-grain, never touches the corpus again)
    joined back on the shared w1 partitioning. Probabilities divide two
    exact BIGINTs as doubles - identical IEEE results in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    par = docs.sparkSession.sparkContext.defaultParallelism
    w = (
        docs.repartition(par, "doc_id")
        .select("doc_id", _words_col().alias("words"))
        .filter(F.size("words") >= 2)
        .groupBy("doc_id")
        .agg(F.first("words").alias("words"))
    )
    bigrams = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1), "
                "i -> struct(words[i-1] AS w1, words[i] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c2.groupBy("w1").agg(F.sum("n12").alias("n1"))
    return (
        c2.join(c1, "w1")
        .select(
            "w1",
            "w2",
            "n12",
            "n1",
            (F.col("n12") / F.col("n1")).alias("cond_prob"),
        )
        .orderBy(F.col("n12").desc(), "w1", "w2")
        .limit(50)
    )


@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH docs_w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\W+'), w -> w <> '') AS words
        FROM documents
    ),
    tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(words) AS w FROM docs_w)
        GROUP BY 1, 2
    ),
    df AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    scored AS (
        SELECT t.doc_id, t.w, t.tf, d.df,
               t.tf / d.df AS score,
               row_number() OVER (
                   PARTITION BY t.doc_id
                   ORDER BY t.tf / d.df DESC, t.w
               ) AS rn
        FROM tf t JOIN df d ON t.w = d.w
    )
    SELECT doc_id, w AS term, tf, df, score,
           CAST(rn AS BIGINT) AS rank
    FROM scored WHERE rn <= 3
    """,
    doc="Distinctive terms per document (tf-idf shape): score = tf/df as "
    "one exact-integer IEEE division (ln-based idf is not bit-portable "
    "across engines; tf/df ranks identically for fixed N), top-3 per doc.",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IR term-weighting pipeline: per-doc term frequencies (one
    (doc, term) shuffle with map-side combine), document frequencies as a
    grain-to-grain re-aggregation of tf (never rescans the corpus), a
    keyed join back on term, and a per-doc window for the top-3. All
    counts stay exact BIGINT; the single division per row is the only
    float, so ranking and hashes agree across engines."""
    docs = load_table(spark, sf_dir, "documents")
    par = docs.sparkSession.sparkContext.defaultParallelism
    w = (
        docs.repartition(par, "doc_id")
        .select("doc_id", _words_col().alias("words"))
        .groupBy("doc_id")
        .agg(F.first("words").alias("words"))
        .select("doc_id", F.explode("words").alias("w"))
    )
    tf = w.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql.window import Window

    score = F.col("tf") / F.col("df")
    win = Window.partitionBy("doc_id").orderBy(score.desc(), "w")
    return (
        tf.join(df, "w")
        .select(
            "doc_id",
            F.col("w").alias("term"),
            "tf",
            "df",
            score.alias("score"),
            F.row_number().over(win).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


COOC_MIN_PAIRS = 20  # noise floor for the lift ranking


@register(
    "word_cooccurrence_lift",
    oracle=rf"""
    WITH docs_w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\W+'), w -> w <> '') AS words
        FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, len(words)),
                      i -> {{'w1': words[i], 'w2': words[i+1]}})) AS bg
        FROM docs_w WHERE len(words) >= 2
    ),
    c12 AS (
        SELECT bg.w1 AS w1, bg.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS n12
        FROM pairs GROUP BY 1, 2
    ),
    totals AS (SELECT CAST(SUM(n12) AS BIGINT) AS n FROM c12),
    left_c AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1),
    right_c AS (SELECT w2, CAST(SUM(n12) AS BIGINT) AS n2 FROM c12 GROUP BY 1)
    SELECT c.w1, c.w2, c.n12,
           (c.n12 * t.n) / (l.n1 * r.n2) AS lift
    FROM c12 c
    JOIN left_c l ON c.w1 = l.w1
    JOIN right_c r ON c.w2 = r.w2
    CROSS JOIN totals t
    WHERE c.n12 >= {COOC_MIN_PAIRS}
    ORDER BY (c.n12 * t.n) / (l.n1 * r.n2) DESC, c.w1, c.w2
    LIMIT 50
    """,
    doc="Adjacent-word association by lift = P(w1,w2)/(P(w1)P(w2)) "
    "= n12*N/(n1*n2) - collocation mining with PMI's ranking but one "
    "exact-integer division (log is not bit-portable across engines).",
)
def word_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining at corpus scale: everything downstream of the
    one (w1, w2) count shuffle is grain-to-grain re-aggregation (marginals
    and the grand total never rescan the corpus); the grand total joins
    back as a broadcast single row. n12*N and n1*n2 are exact BIGINTs, so
    the lift ranking is engine-identical after one IEEE division."""
    docs = load_table(spark, sf_dir, "documents")
    par = docs.sparkSession.sparkContext.defaultParallelism
    w = (
        docs.repartition(par, "doc_id")
        .select("doc_id", _words_col().alias("words"))
        .filter(F.size("words") >= 2)
        .groupBy("doc_id")
        .agg(F.first("words").alias("words"))
    )
    c12 = (
        w.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(words) - 1), "
                    "i -> struct(words[i-1] AS w1, words[i] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n12"))
    )
    totals = c12.agg(F.sum("n12").alias("n"))
    left_c = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    right_c = c12.groupBy("w2").agg(F.sum("n12").alias("n2"))
    lift = (F.col("n12") * F.col("n")) / (F.col("n1") * F.col("n2"))
    return (
        c12.filter(F.col("n12") >= COOC_MIN_PAIRS)
        .join(left_c, "w1")
        .join(right_c, "w2")
        .crossJoin(F.broadcast(totals))
        .select("w1", "w2", "n12", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(50)
    )


CHUNK_WORDS = 32  # context-window chunk size (words)
CHUNK_STRIDE = 24  # 8-word overlap between consecutive chunks


@register(
    "chunk_documents",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\W+'), w -> w <> '') AS words
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               unnest(range(0, GREATEST(len(words) - {CHUNK_WORDS} + {CHUNK_STRIDE}, 1),
                            {CHUNK_STRIDE})) AS start0,
               words
        FROM base WHERE len(words) > 0
    )
    SELECT doc_id,
           CAST(start0 / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(LEAST(len(words) - start0, {CHUNK_WORDS}) AS BIGINT) AS n_words,
           md5(array_to_string(words[start0 + 1 : start0 + {CHUNK_WORDS}], ' ')) AS chunk_hash
    FROM chunks
    """,
    doc=f"Context-window chunking: split each document into "
    f"{CHUNK_WORDS}-word chunks with stride {CHUNK_STRIDE} "
    f"({CHUNK_WORDS - CHUNK_STRIDE}-word overlap) - the sliding-window "
    "prep step for fixed-context training/embedding; chunk text is "
    "md5'd to stay hash-checkable.",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure per-row array arithmetic: chunk starts are a sequence(),
    slices are slice() - one Generate per doc, no shuffle at all, so a
    100 TB corpus chunks in a single map pass that feeds the tokenizer/
    embedder directly. Overlap preserves cross-boundary context exactly
    like production context-window pipelines."""
    docs = load_table(spark, sf_dir, "documents")
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = (
        docs.repartition(par, "doc_id")
        .select("doc_id", _words_col().alias("words"))
        .filter(F.size("words") > 0)
        # materialization barrier before the explode (dedup._shingles_spark)
        .groupBy("doc_id")
        .agg(F.first("words").alias("words"))
    )
    starts = F.expr(
        f"sequence(0, greatest(size(words) - {CHUNK_WORDS} + {CHUNK_STRIDE} - 1, 0), "
        f"{CHUNK_STRIDE})"
    )
    return (
        base.select("doc_id", "words", F.explode(starts).alias("start0"))
        .select(
            "doc_id",
            (F.col("start0") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.least(F.size("words") - F.col("start0"), F.lit(CHUNK_WORDS))
            .cast("long")
            .alias("n_words"),
            F.md5(
                F.concat_ws(
                    " ", F.expr(f"slice(words, start0 + 1, {CHUNK_WORDS})")
                )
            ).alias("chunk_hash"),
        )
    )


@register(
    "doc_lm_score",
    oracle=r"""
    WITH docs_w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\W+'), w -> w <> '') AS words
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(words)),
                      i -> {'w1': words[i], 'w2': words[i+1]})) AS b
        FROM docs_w WHERE len(words) >= 2
    ),
    flat AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
    c2 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM flat GROUP BY 1, 2
    ),
    c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c2 GROUP BY 1),
    probs AS (
        SELECT c2.w1, c2.w2, (c2.n12 * 1000000) // c1.n1 AS p_scaled
        FROM c2 JOIN c1 ON c2.w1 = c1.w1
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(p.p_scaled) AS BIGINT) AS sum_p,
           CAST(SUM(p.p_scaled) AS DOUBLE) / 1000000.0
               / CAST(COUNT(*) AS DOUBLE) AS avg_prob
    FROM flat f JOIN probs p ON f.w1 = p.w1 AND f.w2 = p.w2
    GROUP BY 1
    """,
    doc="Per-document LM quality score: average corpus-bigram conditional "
    "probability over the doc's token stream (integer-scaled probs, so "
    "both engines agree exactly) — the cheap perplexity-proxy filter a "
    "curation pipeline runs before an expensive model-based one.",
)
def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the LM side is vocabulary-bounded (bigram counts shuffle
    once with map-side combine, prefix counts re-aggregate those); the
    scoring side joins the positional bigram stream to the prob table on
    (w1, w2) — Zipf makes the table small enough to broadcast in
    practice, and AQE picks that up — then one groupBy(doc_id) with
    exact integer sums. Probabilities are quantized ((n12*1e6) div n1)
    so the per-doc mean is bit-identical across engines and partition
    orders."""
    docs = load_table(spark, sf_dir, "documents")
    par = docs.sparkSession.sparkContext.defaultParallelism
    w = (
        docs.repartition(par, "doc_id")
        .select("doc_id", _words_col().alias("words"))
        .filter(F.size("words") >= 2)
        .groupBy("doc_id")
        .agg(F.first("words").alias("words"))
    )
    flat = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1), "
                "i -> struct(words[i-1] AS w1, words[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    flat = flat.localCheckpoint()  # one tokenize pass feeds LM + scoring
    c2 = flat.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c2.groupBy("w1").agg(F.sum("n12").alias("n1"))
    probs = c2.join(c1, "w1").select(
        "w1", "w2", F.expr("(n12 * 1000000) div n1").alias("p_scaled")
    )
    return (
        flat.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("p_scaled").cast("long").alias("sum_p"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_p",
            (
                F.col("sum_p").cast("double")
                / F.lit(1000000.0)
                / F.col("n_bigrams").cast("double")
            ).alias("avg_prob"),
        )
    )


#: Char-span mining geometry: spans of SPAN_LEN chars sampled every
#: SPAN_STRIDE chars — the cheap approximation of suffix-array substring
#: dedup (Lee et al. 2022): any duplicated run ≥ SPAN_LEN+SPAN_STRIDE
#: chars is guaranteed to share at least one sampled span.
SPAN_LEN = 20
SPAN_STRIDE = 10
SPAN_TOP = 100


@register(
    "substring_dup_spans",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, (len(text) - {SPAN_LEN}) // {SPAN_STRIDE} + 1),
                   k -> substr(text, k * {SPAN_STRIDE} + 1, {SPAN_LEN})
               )) AS span
        FROM documents
        WHERE len(text) >= {SPAN_LEN}
    )
    SELECT span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occur,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM grams
    GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, span
    LIMIT {SPAN_TOP}
    """,
    doc=f"Cross-document duplicated character spans: {SPAN_LEN}-char "
    f"windows sampled every {SPAN_STRIDE} chars, grouped corpus-wide; "
    "spans in ≥ 2 docs surface verbatim boilerplate — the stride-sampled "
    "stand-in for suffix-array substring dedup (Lee et al. 2022).",
)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: span extraction is a codegen Generate (≈ chars/stride rows
    per doc, 10× smaller than char-grams at stride 1); the census is ONE
    groupBy(span) with map-side combine. No pairwise join at all — the
    span table IS the dedup index, and the top-k is
    TakeOrderedAndProject. Stride trades recall for cost linearly:
    runs ≥ len+stride chars are always caught."""
    docs = load_table(spark, sf_dir, "documents")
    par = docs.sparkSession.sparkContext.defaultParallelism
    grams = (
        docs.repartition(par, "doc_id")
        .filter(F.length("text") >= SPAN_LEN)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, (length(text) - {SPAN_LEN}) "
                    f"div {SPAN_STRIDE}), "
                    f"k -> substring(text, k * {SPAN_STRIDE} + 1, {SPAN_LEN}))"
                )
            ).alias("span"),
        )
    )
    return (
        grams.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occur"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "span")
        .limit(SPAN_TOP)
    )


# ---------------------------------------------------------------------------
# Gopher rule battery (round 3)
# ---------------------------------------------------------------------------

#: Published Gopher quality-rule thresholds (Rae et al. 2021, §A1.1),
#: adapted where the synthetic corpus lacks the signal (no lines → no
#: bullet/ellipsis rules; word-count floor lowered to keep the rule
#: non-degenerate on ~40-word test docs; production uses 50).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI = 3.0, 10.0
GOPHER_MIN_DISTINCT_STOP = 2
GOPHER_MAX_DUP_WORD_FRAC = 0.7


@register(
    "quality_gopher_rules",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS words
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
               CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS sum_len,
               CAST(len(list_distinct(list_filter(words,
                    x -> list_contains({_EN_LIST_SQL}, x)))) AS BIGINT) AS n_stop_distinct
        FROM w WHERE len(words) > 0
    ),
    flags AS (
        SELECT doc_id, n_words,
               CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS BIGINT) AS r_wordcount,
               CAST(CAST(sum_len AS DOUBLE) / n_words
                    BETWEEN {GOPHER_MEAN_LEN_LO} AND {GOPHER_MEAN_LEN_HI} AS BIGINT) AS r_mean_len,
               CAST(n_stop_distinct >= {GOPHER_MIN_DISTINCT_STOP} AS BIGINT) AS r_stopwords,
               CAST(1.0 - CAST(n_distinct AS DOUBLE) / n_words
                    <= {GOPHER_MAX_DUP_WORD_FRAC} AS BIGINT) AS r_dup_words
        FROM m
    )
    SELECT doc_id, n_words, r_wordcount, r_mean_len, r_stopwords, r_dup_words,
           CAST(r_wordcount + r_mean_len + r_stopwords + r_dup_words = 4 AS BIGINT) AS gopher_pass
    FROM flags
    """,
    doc="The Gopher quality-rule battery (word-count bounds, mean word "
    "length, ≥2 distinct stopwords, duplicate-word fraction) as per-rule "
    "flags plus the conjunctive pass bit — the published rule filter run "
    "between language-ID and dedup in large-corpus recipes.",
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: map-only — every rule is an expression over the word array;
    no shuffle at all (the ideal quality-gate plan: it fuses into the
    corpus scan and its selectivity prunes every downstream stage)."""
    docs = load_table(spark, sf_dir, "documents")
    en = "array('the','a','of','and','to','in','is')"
    m = docs.select(
        "doc_id",
        _words_col().alias("words"),
    ).filter(F.size("words") > 0).select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.size(F.array_distinct("words")).cast("long").alias("n_distinct"),
        F.expr("aggregate(words, 0L, (acc, x) -> acc + length(x))").alias("sum_len"),
        F.size(
            F.array_distinct(F.expr(f"filter(words, x -> array_contains({en}, x))"))
        ).cast("long").alias("n_stop_distinct"),
    )
    r_wordcount = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS).cast("long")
    r_mean_len = (
        (F.col("sum_len").cast("double") / F.col("n_words"))
        .between(GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI)
        .cast("long")
    )
    r_stop = (F.col("n_stop_distinct") >= GOPHER_MIN_DISTINCT_STOP).cast("long")
    r_dup = (
        (F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_words"))
        <= GOPHER_MAX_DUP_WORD_FRAC
    ).cast("long")
    return m.select(
        "doc_id",
        "n_words",
        r_wordcount.alias("r_wordcount"),
        r_mean_len.alias("r_mean_len"),
        r_stop.alias("r_stopwords"),
        r_dup.alias("r_dup_words"),
        (r_wordcount + r_mean_len + r_stop + r_dup == 4).cast("long").alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# Corpus rollups: packing fragmentation + tokenizer fertility (round 3)
# ---------------------------------------------------------------------------

#: Context-window budget for the fragmentation report — matches the
#: packing query so the two reports describe the same trainer layout.
FRAG_WINDOW = 512


@register(
    "packing_fragmentation_report",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split_regex(lower(text), '\W+'),
                                    w -> w <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    placed AS (
        SELECT lang, n_tokens,
               CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - n_tokens)
                    % {FRAG_WINDOW} AS BIGINT) AS pack_offset
        FROM toks
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + {FRAG_WINDOW} - 1) // {FRAG_WINDOW} AS BIGINT)
               AS n_packs,
           CAST(SUM(CAST(pack_offset + n_tokens > {FRAG_WINDOW} AS BIGINT))
               AS BIGINT) AS n_split_docs,
           CAST(SUM(CAST(pack_offset + n_tokens > {FRAG_WINDOW} AS BIGINT))
                * 1000 // COUNT(*) AS BIGINT) AS split_rate_permille
    FROM placed
    GROUP BY lang
    ORDER BY lang
    """,
    doc=f"Packing fragmentation: under the {FRAG_WINDOW}-token contiguous "
    "packing layout (pack_sequences_cumsum), how many documents straddle "
    "a context-window boundary per language — the attention-contamination "
    "/ truncation metric a training-data team tracks when choosing "
    "sequence length. Exact integer permille.",
)
def packing_fragmentation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: same single lang-partitioned cumsum window as the packing
    query (range-bucket cumsum swaps in for a mono-lingual corpus), then
    one lang-grain aggregate. A doc splits iff its pack offset plus its
    own length crosses the window boundary — pure integer arithmetic on
    the running total, no per-pack explode."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.expr(
            r"cast(size(filter(split(lower(text), '\\W+'), w -> w <> '')) as long)"
        ).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = ((F.sum("n_tokens").over(w) - F.col("n_tokens")) % FRAG_WINDOW).cast(
        "long"
    )
    placed = toks.select(
        "lang",
        "n_tokens",
        offset.alias("pack_offset"),
    )
    split = (F.col("pack_offset") + F.col("n_tokens") > FRAG_WINDOW).cast("long")
    return (
        placed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.expr(f"(sum(n_tokens) + {FRAG_WINDOW} - 1) div {FRAG_WINDOW}")
            .cast("long")
            .alias("n_packs"),
            F.sum(split).cast("long").alias("n_split_docs"),
            F.expr(
                f"sum(cast(pack_offset + n_tokens > {FRAG_WINDOW} as bigint))"
                " * 1000 div count(*)"
            )
            .cast("long")
            .alias("split_rate_permille"),
        )
        .orderBy("lang")
    )


@register(
    "token_fertility_by_lang",
    oracle=r"""
    WITH w AS (
        SELECT lang,
               length(text) AS n_chars,
               list_filter(string_split_regex(lower(text), '\W+'),
                           x -> x <> '') AS words
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(words)) AS BIGINT) AS n_words,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(list_sum(list_transform(words, x -> length(x))))
                AS BIGINT) AS n_word_chars,
           CAST(SUM(list_sum(list_transform(words, x -> length(x)))) * 1000
                // SUM(len(words)) AS BIGINT) AS chars_per_word_permille,
           CAST(SUM(len(words)) * 1000 // COUNT(*) AS BIGINT)
               AS words_per_doc_permille
    FROM w
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Tokenizer fertility profile per language: corpus-level word and "
    "character masses plus exact integer-permille chars-per-word and "
    "words-per-doc ratios — the per-language budget table that sets "
    "sampling weights when a token budget (not a doc budget) drives the "
    "data mixture.",
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: map-only word split fused into the scan, then one
    lang-grain hash aggregate with map-side combine — no window, no
    join. Ratios are floor-division permille so the profile is
    engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        _words_col().alias("words"),
    )
    return (
        w.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("words")).cast("long").alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum(F.expr("aggregate(words, 0L, (acc, x) -> acc + length(x))"))
            .cast("long")
            .alias("n_word_chars"),
            F.expr(
                "sum(aggregate(words, 0L, (acc, x) -> acc + length(x))) * 1000"
                " div sum(size(words))"
            )
            .cast("long")
            .alias("chars_per_word_permille"),
            F.expr("sum(size(words)) * 1000 div count(*)")
            .cast("long")
            .alias("words_per_doc_permille"),
        )
        .orderBy("lang")
    )


from etl_loading_scripts_spark.registry import REGISTRY as _REGISTRY  # noqa: E402


@register(
    "quality_filter_funnel",
    oracle=f"""
    WITH flags AS ({_REGISTRY['quality_gopher_rules'].oracle})
    SELECT 0 AS stage, 'input' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words
    FROM flags
    UNION ALL
    SELECT 1, 'wordcount', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_words) AS BIGINT)
    FROM flags WHERE r_wordcount = 1
    UNION ALL
    SELECT 2, 'mean_len', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_words) AS BIGINT)
    FROM flags WHERE r_wordcount = 1 AND r_mean_len = 1
    UNION ALL
    SELECT 3, 'stopwords', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_words) AS BIGINT)
    FROM flags WHERE r_wordcount = 1 AND r_mean_len = 1 AND r_stopwords = 1
    UNION ALL
    SELECT 4, 'dup_words', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_words) AS BIGINT)
    FROM flags WHERE r_wordcount = 1 AND r_mean_len = 1 AND r_stopwords = 1
                 AND r_dup_words = 1
    """,
    doc="Quality-filter waterfall: documents and token mass surviving "
    "after each Gopher rule applied IN ORDER (input → wordcount → mean "
    "length → stopwords → duplicate-words) — the attribution report "
    "every filtering recipe publishes, and the one that shows which "
    "rule actually pays for its false-positive risk (a rule that drops "
    "nothing after its predecessors is free to remove).",
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass over the per-doc rule flags (`quality_gopher_rules`,
    composed verbatim): the five funnel stages are conditional
    aggregates of cumulative rule conjunctions, stacked — no repeated
    corpus scans, no joins. At 100 TB the funnel is the same single
    map+aggregate as the gate itself."""
    flags = quality_gopher_rules(spark, sf_dir)
    s1 = F.col("r_wordcount") == 1
    s2 = s1 & (F.col("r_mean_len") == 1)
    s3 = s2 & (F.col("r_stopwords") == 1)
    s4 = s3 & (F.col("r_dup_words") == 1)
    agg = flags.agg(
        F.count(F.lit(1)).alias("d0"),
        F.sum("n_words").alias("w0"),
        F.sum(s1.cast("int")).cast("bigint").alias("d1"),
        F.sum(F.when(s1, F.col("n_words")).otherwise(0)).alias("w1"),
        F.sum(s2.cast("int")).cast("bigint").alias("d2"),
        F.sum(F.when(s2, F.col("n_words")).otherwise(0)).alias("w2"),
        F.sum(s3.cast("int")).cast("bigint").alias("d3"),
        F.sum(F.when(s3, F.col("n_words")).otherwise(0)).alias("w3"),
        F.sum(s4.cast("int")).cast("bigint").alias("d4"),
        F.sum(F.when(s4, F.col("n_words")).otherwise(0)).alias("w4"),
    )
    return agg.selectExpr(
        "stack(5, "
        "0, 'input', d0, w0, "
        "1, 'wordcount', d1, w1, "
        "2, 'mean_len', d2, w2, "
        "3, 'stopwords', d3, w3, "
        "4, 'dup_words', d4, w4"
        ") AS (stage, rule, n_docs, n_words)"
    ).selectExpr(
        "cast(stage as int) as stage",
        "rule",
        "cast(n_docs as bigint) as n_docs",
        "cast(n_words as bigint) as n_words",
    )


@register(
    "langid_confusion_matrix",
    oracle=f"""
    WITH preds AS ({_REGISTRY['text_language_id'].oracle})
    SELECT labeled_lang AS true_lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN labeled_lang = pred_lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
    FROM preds GROUP BY 1, 2
    """,
    doc="Language-ID evaluation: the classifier's predictions crossed "
    "with the labeled language as a confusion matrix (true, predicted, "
    "count) — per-cell precision/recall fall straight out, and the "
    "off-diagonal cells name exactly which language pairs the "
    "function-word heuristic confuses (plus the 'und' abstentions). The "
    "eval every classifier-based filter owes its mixture report.",
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the registered classifier verbatim, so the eval can never
    drift from the deployed predictor — same discipline as
    ann_recall_audit. One aggregate over the prediction pass; the
    matrix is |langs|² bounded regardless of corpus size."""
    preds = text_language_id(spark, sf_dir)
    return preds.groupBy(
        F.col("labeled_lang").alias("true_lang"), "pred_lang"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("labeled_lang") == F.col("pred_lang")).cast("int"))
        .cast("bigint")
        .alias("n_correct"),
    )


@register(
    "encoding_mojibake_repair",
    oracle="""
    WITH seeded AS (
        SELECT doc_id, source,
               text
               || CASE WHEN doc_id % 3 = 0 THEN ' cafÃ©' ELSE '' END
               || CASE WHEN doc_id % 4 = 0 THEN ' naÃ¯ve' ELSE '' END
                   AS raw
        FROM documents
    ),
    scanned AS (
        SELECT source, raw,
               CAST(len(regexp_extract_all(raw, 'Ã[©¯]')) AS BIGINT) AS n_seq,
               replace(replace(raw, 'Ã©', 'é'), 'Ã¯', 'ï') AS repaired
        FROM seeded
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_seq > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mojibake_docs,
           CAST(SUM(n_seq) AS BIGINT) AS n_sequences,
           CAST(SUM(length(raw) - length(repaired)) AS BIGINT) AS chars_saved
    FROM scanned GROUP BY 1
    """,
    doc="Mojibake detection + repair: UTF-8-as-Latin-1 double-encoding "
    "artifacts ('Ã©' for é, 'Ã¯' for ï — the single most common "
    "encoding corruption in web scrapes) are planted deterministically, "
    "detected by codepoint-pair regex, and repaired by reverse mapping; "
    "per-source corpus health counts. Planting inside the query keeps "
    "the expected counts oracle-derivable (the synthetic corpus is "
    "clean ASCII).",
)
def encoding_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: detection and repair are map-side string expressions fused
    into the scan (regexp + replace chain — no UDF, no shuffle before
    the 5-group rollup). A real pipeline runs exactly this shape over
    raw crawl text before tokenization: mojibake inflates token counts
    (Ã© is 2 codepoints → 2+ tokens where é is 1) and poisons dedup
    hashes, so the repair pass pays for itself in downstream compute.
    The pair-regex approach extends to the full cp1252 mapping table as
    more replace links in the same chain."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, " cafÃ©").otherwise(""),
        F.when(F.col("doc_id") % 4 == 0, " naÃ¯ve").otherwise(""),
    )
    scanned = docs.select(
        "source",
        raw.alias("raw"),
        F.size(F.expr("regexp_extract_all(raw, 'Ã[©¯]', 0)")).cast("bigint").alias("n_seq"),
        F.regexp_replace(
            F.regexp_replace(raw, "Ã©", "é"),
            "Ã¯",
            "ï",
        ).alias("repaired"),
    )
    return scanned.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("n_seq") > 0).cast("int")).cast("bigint").alias("n_mojibake_docs"),
        F.sum("n_seq").cast("bigint").alias("n_sequences"),
        F.sum(F.length("raw") - F.length("repaired")).cast("bigint").alias("chars_saved"),
    )


@register(
    "sft_conversation_validate",
    oracle="""
    WITH turns AS (
        SELECT user_id AS convo_id,
               CASE WHEN event_id % 3 = 0 THEN 'assistant' ELSE 'user' END AS role,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS turn_no,
               LAG(CASE WHEN event_id % 3 = 0 THEN 'assistant' ELSE 'user' END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_role
        FROM events
    ),
    per_convo AS (
        SELECT convo_id,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               MIN(CASE WHEN turn_no = 1 THEN role END) AS first_role,
               MAX(CASE WHEN turn_no = n_max THEN role END) AS last_role,
               CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_repeats
        FROM (SELECT *, MAX(turn_no) OVER (PARTITION BY convo_id) AS n_max
              FROM turns)
        GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_convos,
           CAST(SUM(CASE WHEN first_role = 'user' AND last_role = 'assistant'
                          AND n_repeats = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_valid,
           CAST(SUM(CASE WHEN first_role <> 'user' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad_start,
           CAST(SUM(CASE WHEN last_role <> 'assistant' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad_end,
           CAST(SUM(n_repeats) AS BIGINT) AS n_repeat_violations,
           CAST(SUM(n_turns) AS BIGINT) AS n_turns_total
    FROM per_convo
    """,
    doc="SFT conversation-structure validation: events grouped per user "
    "into a conversation (deterministic turn order by ts, event_id; "
    "roles planted by event_id mod 3), then the three structural rules "
    "every chat-template fine-tune corpus must pass are checked — "
    "starts with a user turn, ends with an assistant turn, roles "
    "strictly alternate (no same-role repeats). Corpus-level counts of "
    "each violation class — the gate that runs before any tokenization "
    "of instruction data.",
)
def sft_conversation_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one window pass partitioned by conversation id (lag +
    row_number share the same partitioning — single shuffle), then a
    conversation-grain aggregate and a 1-row corpus rollup. Violations
    are counted, not raised: real instruction datasets fail these
    checks constantly (truncated scrapes, tool-call interleaving) and
    the pipeline's job is to quantify and route, not die. Extending to
    system-turn placement or tool-role grammars is more CASE arms in
    the same single-pass shape."""
    events = load_table(spark, sf_dir, "events")
    role = F.when(F.col("event_id") % 3 == 0, "assistant").otherwise("user")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    turns = events.select(
        F.col("user_id").alias("convo_id"),
        role.alias("role"),
        F.row_number().over(w).alias("turn_no"),
        F.lag(role).over(w).alias("prev_role"),
    )
    wmax = Window.partitionBy("convo_id")
    turns = turns.withColumn("n_max", F.max("turn_no").over(wmax))
    per_convo = turns.groupBy("convo_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.min(F.when(F.col("turn_no") == 1, F.col("role"))).alias("first_role"),
        F.max(F.when(F.col("turn_no") == F.col("n_max"), F.col("role"))).alias(
            "last_role"
        ),
        F.sum((F.col("role") == F.col("prev_role")).cast("int"))
        .cast("bigint")
        .alias("n_repeats"),
    )
    return per_convo.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_convos"),
        F.sum(
            (
                (F.col("first_role") == "user")
                & (F.col("last_role") == "assistant")
                & (F.col("n_repeats") == 0)
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_valid"),
        F.sum((F.col("first_role") != "user").cast("int"))
        .cast("bigint")
        .alias("n_bad_start"),
        F.sum((F.col("last_role") != "assistant").cast("int"))
        .cast("bigint")
        .alias("n_bad_end"),
        F.sum("n_repeats").cast("bigint").alias("n_repeat_violations"),
        F.sum("n_turns").cast("bigint").alias("n_turns_total"),
    )


@register(
    "doc_length_cap_analysis",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    ),
    p95 AS (
        SELECT source, MIN(n_chars) AS cap_chars
        FROM ranked WHERE rn * 100 >= n * 95
        GROUP BY 1
    )
    SELECT r.source,
           CAST(MAX(r.n) AS BIGINT) AS n_docs,
           CAST(MAX(p.cap_chars) AS BIGINT) AS cap_chars,
           CAST(SUM(CASE WHEN r.n_chars > p.cap_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_truncated,
           CAST(SUM(CASE WHEN r.n_chars > p.cap_chars
                         THEN r.n_chars - p.cap_chars ELSE 0 END)
                AS BIGINT) AS chars_saved,
           CAST(SUM(r.n_chars) AS BIGINT) AS chars_total
    FROM ranked r JOIN p95 p ON p.source = r.source
    GROUP BY 1
    """,
    doc="Length-cap policy analysis: per source, the exact p95 document "
    "length (rank-based — rn·100 ≥ n·95, no float percentiles), how "
    "many documents a cap-at-p95 policy would truncate, and the "
    "character mass saved — the measurement behind choosing a max-"
    "document-length cutoff before tokenization, where a handful of "
    "giant documents otherwise dominate token budgets and pack poorly.",
)
def doc_length_cap_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one window pass partitioned by source (bounded grain) for
    rank and population, a 20-row cap table joined back broadcast, and a
    source-grain rollup — the fact is scanned twice but shuffled once.
    The exact-rank percentile is the same integer idiom as
    winsorized_spend_by_nation: cross-engine stable where
    percentile_approx/quantile built-ins are not."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    ranked = docs.select("source", "n_chars", "doc_id").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count(F.lit(1)).over(wn))
    p95 = (
        ranked.filter(F.col("rn") * 100 >= F.col("n") * 95)
        .groupBy("source")
        .agg(F.min("n_chars").alias("cap_chars"))
    )
    joined = ranked.join(F.broadcast(p95), "source")
    return joined.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.max("cap_chars").cast("bigint").alias("cap_chars"),
        F.sum((F.col("n_chars") > F.col("cap_chars")).cast("int"))
        .cast("bigint")
        .alias("n_docs_truncated"),
        F.sum(
            F.when(
                F.col("n_chars") > F.col("cap_chars"),
                F.col("n_chars") - F.col("cap_chars"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("chars_saved"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
    )


@register(
    "readability_scores",
    oracle="""
    WITH counts AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
                   AS n_words,
               CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS n_sents,
               CAST(list_sum(list_transform(
                        regexp_extract_all(text, '[a-z0-9]+'),
                        w -> GREATEST(len(regexp_extract_all(w,
                                 '[aeiouy]+')), 1)
                    )) AS BIGINT) AS n_syll
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_sents) AS BIGINT) AS n_sents,
           CAST(SUM(n_syll) AS BIGINT) AS n_syllables,
           CAST(SUM(CAST(206835 * n_sents * n_words
                         - 1015 * n_words * n_words
                         - 84600 * n_syll * n_sents AS BIGINT))
                AS BIGINT) AS flesch_num_milli,
           CAST(SUM(n_sents * n_words) AS BIGINT) AS flesch_den
    FROM counts GROUP BY 1
    """,
    doc="Flesch reading-ease readability per source: words, sentence "
    "terminators, and vowel-group syllable approximations counted by "
    "engine-portable regexes; the score 206.835 − 1.015·(W/S) − "
    "84.6·(Syl/W) is carried as an EXACT integer (numerator in "
    "milli-units over the common denominator S·W, summed per doc) so "
    "the hash can never drift on float division — consumers divide at "
    "display time. The classic quality-filter feature for separating "
    "prose from boilerplate/code/tables.",
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: three map-side regex passes fused into the scan (the
    syllable count is a transform-over-extract_all lambda — still
    JVM-side, no UDF), then a source-grain rollup. The vowel-group
    syllable heuristic is the standard cheap approximation (true
    syllabification needs a dictionary); its error is stable across a
    corpus, which is all a RANKING feature needs. Milli-unit integers:
    206.835 → 206835, 1.015 → 1015 (×W/S·1000), 84.6 → 84600."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")
    counts = docs.select(
        "source",
        F.size(words).cast("bigint").alias("n_words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        ).cast("bigint").alias("n_sents"),
        F.expr(
            "aggregate(transform(regexp_extract_all(text, '[a-z0-9]+', 0), "
            "w -> greatest(size(regexp_extract_all(w, '[aeiouy]+', 0)), 1)), "
            "0L, (acc, x) -> acc + x)"
        ).cast("bigint").alias("n_syll"),
    )
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_sents").cast("bigint").alias("n_sents"),
        F.sum("n_syll").cast("bigint").alias("n_syllables"),
        F.sum(
            F.lit(206835) * F.col("n_sents") * F.col("n_words")
            - F.lit(1015) * F.col("n_words") * F.col("n_words")
            - F.lit(84600) * F.col("n_syll") * F.col("n_sents")
        ).cast("bigint").alias("flesch_num_milli"),
        F.sum(F.col("n_sents") * F.col("n_words")).cast("bigint").alias("flesch_den"),
    )


#: Fixed public merge ranks for the BPE APPLY demo (the most common
#: English merges — ranks matter: 'th e'→'the' must see 'th' already
#: merged). Symbols are space-separated; '▁' marks word boundaries
#: (the GPT/SentencePiece convention).
BPE_MERGES = [
    ("t h", "th"), ("th e", "the"), ("i n", "in"), ("a n", "an"),
    ("e r", "er"), ("o n", "on"), ("r e", "re"), ("an d", "and"),
    ("o r", "or"), ("e n", "en"), ("a t", "at"), ("e s", "es"),
    ("▁ the", "▁the"), ("▁ and", "▁and"), ("▁ a", "▁a"), ("▁ t", "▁t"),
]


@register(
    "bpe_apply_encode",
    oracle=(
        """
    WITH prepped AS (
        SELECT doc_id,
               '▁' || replace(
                   regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                   ' ', '▁') AS s
        FROM documents
    ),
    symbols AS (
        SELECT doc_id,
               array_to_string(list_filter(string_split(s, ''),
                                           c -> c <> ''), ' ') AS toks
        FROM prepped
    ),
    merged AS (
        SELECT doc_id, """
        + "".join(
            f"replace(" for _ in range(16)
        )
        + "toks"
        + "".join(
            f", '{a}', '{b}')" for a, b in [
                ("t h", "th"), ("th e", "the"), ("i n", "in"), ("a n", "an"),
                ("e r", "er"), ("o n", "on"), ("r e", "re"), ("an d", "and"),
                ("o r", "or"), ("e n", "en"), ("a t", "at"), ("e s", "es"),
                ("▁ the", "▁the"), ("▁ and", "▁and"), ("▁ a", "▁a"),
                ("▁ t", "▁t"),
            ]
        )
        + """ AS enc
        FROM symbols
    )
    SELECT doc_id,
           CAST(len(string_split(enc, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(replace(enc, ' ', '')) AS BIGINT) AS n_symbols_chars,
           CAST(length(replace(enc, ' ', '')) AS DOUBLE)
               / len(string_split(enc, ' ')) AS chars_per_token
    FROM merged
    """
    ),
    doc="BPE APPLY (encode) with a fixed public merge table: documents "
    "become '▁'-marked character sequences and the ranked merges apply "
    "as an ordered replace chain over the space-separated symbol "
    "stream — exactly greedy BPE segmentation for this merge set. "
    "Emits per-doc token counts and compression (chars/token). "
    "Entirely JVM-side string ops (no Python in the plan); the oracle "
    "runs the identical chain in DuckDB.",
)
def bpe_apply_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: map-only — normalize, char-explode-join, 16 chained
    literal replaces, token count; no shuffle at all (the driver's
    collect is the only exchange). A learned-merges variant swaps the
    constant table for the output of ``bpe_top_merges`` iterations;
    the apply plan is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.concat(
        F.lit("▁"),
        F.replace(
            F.regexp_replace(F.lower("text"), "[^a-z ]", ""),
            F.lit(" "),
            F.lit("▁"),
        ),
    )
    # space-separated character symbols: split('') yields one-char
    # tokens in both engines (empty strings filtered)
    toks = F.array_join(
        F.filter(F.split(s, ""), lambda c: c != F.lit("")), " "
    )
    enc = toks
    for a, b in BPE_MERGES:
        enc = F.replace(enc, F.lit(a), F.lit(b))
    n_tokens = F.size(F.split(enc, " ")).cast("long")
    n_chars = F.length(F.replace(enc, F.lit(" "), F.lit(""))).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_symbols_chars"),
        (n_chars.cast("double") / n_tokens).alias("chars_per_token"),
    )


@register(
    "sentence_segmentation_stats",
    oracle=r"""
    WITH sent AS (
        SELECT doc_id,
               list_filter(list_transform(
                   string_split_regex(text, '[.!?]+'), s -> trim(s)),
                   s -> s <> '') AS sents
        FROM documents
    )
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(list_sum(list_transform(sents,
                s -> len(string_split_regex(s, '\s+')))) AS BIGINT)
               AS n_words,
           CAST(list_max(list_transform(sents, s -> length(s))) AS BIGINT)
               AS max_sentence_chars
    FROM sent
    WHERE len(sents) > 0
    """,
    doc="Rule-based sentence segmentation ([.!?]+ boundaries — the "
    "engine-portable tier; an ML segmenter swaps in at the same "
    "projection): per-doc sentence count, word total over segmented "
    "sentences, and longest-sentence length — the run-on/fragment "
    "quality signals length-based filters miss.",
)
def sentence_segmentation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure map-side JVM expressions (split/filter/transform/
    aggregate) — no shuffle, no Python; the per-doc arrays never exceed
    the document's own size."""
    docs = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split("text", r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )
    base = docs.select("doc_id", sents.alias("sents")).filter(
        F.size("sents") > 0
    )
    return base.select(
        "doc_id",
        F.size("sents").cast("long").alias("n_sentences"),
        F.aggregate(
            F.transform(F.col("sents"), lambda s: F.size(F.split(s, r"\s+"))),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("long").alias("n_words"),
        F.array_max(
            F.transform(F.col("sents"), lambda s: F.length(s))
        ).cast("long").alias("max_sentence_chars"),
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick) — classifier feature prep (round 6)
# ---------------------------------------------------------------------------


@register(
    "feature_hash_vectors",
    oracle=r"""
    WITH words AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\W+'),
                              w -> w <> '')) AS w
        FROM documents
    ),
    feats AS (
        SELECT doc_id,
               substr(md5(w), 1, 2) AS bucket,
               CASE WHEN substr(md5(w), 3, 1) <= '7' THEN 1 ELSE -1 END AS sgn
        FROM words
    )
    SELECT doc_id, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(sgn) AS BIGINT) AS signed_value
    FROM feats
    GROUP BY 1, 2
    """,
    doc="FEATURE HASHING (the hashing trick): every token maps to one of "
    "256 buckets by its first md5 hex byte, with a second md5 character "
    "deciding the +-1 sign — the collision-unbiasing signed variant "
    "(Weinberger et al.'s formulation) fastText-style quality/language "
    "classifiers train on. Output is the long-form (doc, bucket, count, "
    "signed value) feature table; the vocabulary never needs to be "
    "collected, broadcast, or even known — the property that makes the "
    "trick the 100 TB feature extractor.",
)
def feature_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: tokenize + hash map-side (zero vocab state, unlike a
    CountVectorizer fit which needs a vocabulary pass and broadcast);
    one (doc, bucket)-grain aggregate — output cardinality is bounded
    by docs x 256 regardless of vocabulary size, and the hash family is
    the repo's engine-portable md5-substring convention."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr(r"filter(split(lower(text), '\\W+'), w -> w <> '')")
        ).alias("w"),
    )
    feats = words.select(
        "doc_id",
        F.substring(F.md5("w"), 1, 2).alias("bucket"),
        F.when(F.substring(F.md5("w"), 3, 1) <= "7", F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    return feats.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("sgn").cast("long").alias("signed_value"),
    )
