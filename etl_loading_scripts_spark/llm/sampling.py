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
from etl_loading_scripts_spark.registry import register

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


#: Train/val/test thresholds over the md5-prefix space (80/10/10).
SPLIT_TRAIN_HEX = _rate_hex(0.80)
SPLIT_VAL_HEX = _rate_hex(0.90)


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{SPLIT_TRAIN_HEX}'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{SPLIT_VAL_HEX}'
                THEN 'val' ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by hash "
    "threshold: a document's split is a pure function of its id, so it "
    "never migrates between splits across re-runs, shards, or engines — "
    "the leakage-safe alternative to randomSplit().",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: a scan-side CASE projection, no shuffle, no state, no seed
    file to version. randomSplit() resamples per run (and per partition
    layout) — hash assignment is the only split that survives a 100 TB
    corpus being re-partitioned, appended to, or audited later."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return docs.select(
        "doc_id",
        F.when(prefix < SPLIT_TRAIN_HEX, "train")
        .when(prefix < SPLIT_VAL_HEX, "val")
        .otherwise("test")
        .alias("split"),
    )


VOCAB_K = 100


@register(
    "vocab_top_terms",
    oracle=rf"""
    WITH words AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'),
                                  w -> w <> '')) AS word
        FROM documents
    ),
    counts AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM words GROUP BY 1
    )
    SELECT word, freq FROM counts
    ORDER BY freq DESC, word
    LIMIT {VOCAB_K}
    """,
    doc=f"Corpus vocabulary: explode → count → global top-{VOCAB_K} terms "
    "by frequency — the tokenizer-training / stopword-discovery scan.",
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: explode happens in the scan stage (generator, no shuffle);
    the count is a partial/final hash aggregate on the word key; the
    global top-K is TakeOrderedAndProject — every partition ships only
    its local top K to the driver-side heap, never the full vocabulary.
    Ties broken by word for cross-engine determinism."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.expr(r"filter(split(lower(text), '\\W+'), w -> w <> '')")
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(VOCAB_K)
    )


# ---------------------------------------------------------------------------
# Mixture weights + per-source quotas (round 3)
# ---------------------------------------------------------------------------

#: Temperature for source re-weighting: p_i ∝ tokens_i^TEMP_ALPHA — the
#: multilingual/multi-source sampling recipe (alpha < 1 upsamples the tail,
#: cf. the published XLM-R / mT5 data recipes).
TEMP_ALPHA = 0.7
#: Weights are rounded to 9 decimals on BOTH engines: pow() is IEEE double
#: in each but not correctly-rounded, so the last ulp may differ — the
#: round pins the comparable precision (same discipline as ratio queries).
WEIGHT_DECIMALS = 9


@register(
    "mixture_weights_temperature",
    oracle=rf"""
    WITH toks AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ),
    powed AS (
        SELECT source, n_docs, n_tokens,
               pow(CAST(n_tokens AS DOUBLE), {TEMP_ALPHA}) AS w
        FROM toks
    )
    SELECT source, n_docs, n_tokens,
           round(w / SUM(w) OVER (), {WEIGHT_DECIMALS}) AS sample_weight
    FROM powed
    """,
    doc=f"Temperature-scaled mixture weights: per-source token counts → "
    f"sampling probability ∝ tokens^{TEMP_ALPHA} normalized over sources — "
    "the data-mixing step that decides how often each source is drawn "
    "during training (alpha<1 upsamples low-resource sources).",
)
def mixture_weights_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one hash aggregate to source grain (tiny), then the
    normalization is a window over the source table — |sources| rows, so
    the single-partition window is over a bounded dimension, not data.
    The weights feed `sample_hash_rate`-style hash gates downstream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.ceil(F.col("n_chars") / 4.0).cast("long")).alias("n_tokens"),
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(TEMP_ALPHA))
    powed = toks.withColumn("__w__", w)
    total = Window.partitionBy()
    return powed.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("__w__") / F.sum("__w__").over(total), WEIGHT_DECIMALS).alias(
            "sample_weight"
        ),
    )


#: Per-source document quota: the per-domain cap every crawl pipeline
#: applies so no single domain dominates the corpus.
QUOTA_PER_SOURCE = 10


@register(
    "quota_sample_per_source",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {QUOTA_PER_SOURCE}
    """,
    doc=f"Per-source quota sampling: keep at most {QUOTA_PER_SOURCE} docs "
    "per source, chosen by content-independent hash order (md5 of doc_id) "
    "— the per-domain cap that stops one domain dominating the corpus; "
    "deterministic, so re-crawls keep the same sample.",
)
def quota_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the rank window partitions by source — work distributes
    across sources with no global sort. A single whale source (one domain
    = 30% of the crawl) would skew its partition; the remedy at that
    shape is the two-phase trick: filter rows whose hash prefix clears
    the ~quota/|source| rate FIRST (hash-gate, map-only), then rank only
    the survivors — same result, bounded partition. Hash order (not
    doc_id order) makes the kept set unbiased w.r.t. crawl order."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= QUOTA_PER_SOURCE)
    )


@register(
    "vocab_oov_rate",
    oracle=rf"""
    WITH words AS (
        SELECT lang,
               unnest(list_filter(string_split_regex(lower(text), '\W+'),
                                  w -> w <> '')) AS word
        FROM documents
    ),
    vocab AS (
        SELECT word FROM (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM words GROUP BY 1
            ORDER BY freq DESC, word LIMIT {VOCAB_K}
        )
    )
    SELECT w.lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS oov_rate
    FROM words w LEFT JOIN vocab v ON w.word = v.word
    GROUP BY 1
    """,
    doc=f"Out-of-vocabulary audit: per language, the share of token "
    f"occurrences outside the global top-{VOCAB_K} vocabulary — the "
    "coverage number that decides whether a shared vocabulary/tokenizer "
    "is viable per language or the tail languages need their own; the "
    "companion to token_fertility_by_lang in the tokenizer-budget loop.",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the vocabulary is top-K and therefore broadcast-sized BY
    CONSTRUCTION — the membership probe is a map-side broadcast left
    join whatever the corpus size; token counts are exact integers, the
    one division is the final per-group ratio. This is also the shape
    of any fixed-list scan (blocklist hits, stopword mass): build the
    bounded list, broadcast, one pass."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "lang",
        F.explode(
            F.expr(r"filter(split(lower(text), '\\W+'), w -> w <> '')")
        ).alias("word"),
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(VOCAB_K)
        .select("word", F.lit(1).alias("__in_vocab__"))
    )
    return (
        words.join(F.broadcast(vocab), "word", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab__").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.col("n_oov").cast("double") / F.col("n_tokens")
        )
    )


#: Token budget for the apportionment plan (tokens to draw per epoch).
APPORTION_BUDGET = 1_000_000


@register(
    "token_budget_apportionment",
    oracle=f"""
    WITH src AS (
        SELECT source,
               CAST(SUM(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT) AS tokens
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS c FROM src),
    base AS (
        SELECT s.source, s.tokens,
               CAST(({APPORTION_BUDGET} * s.tokens) // t.c AS BIGINT) AS floor_quota,
               CAST(({APPORTION_BUDGET} * s.tokens) % t.c AS BIGINT) AS remainder
        FROM src s CROSS JOIN tot t
    ),
    short AS (
        SELECT CAST({APPORTION_BUDGET} - SUM(floor_quota) AS BIGINT) AS k FROM base
    ),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (
            ORDER BY remainder DESC, source
        ) AS BIGINT) AS rr
        FROM base
    )
    SELECT r.source, r.tokens, r.floor_quota,
           CAST(r.floor_quota + CASE WHEN r.rr <= s.k THEN 1 ELSE 0 END AS BIGINT)
               AS quota
    FROM ranked r CROSS JOIN short s
    """,
    doc=f"Largest-remainder (Hamilton) apportionment of a "
    f"{APPORTION_BUDGET:,}-token epoch budget across sources proportional "
    "to their exact token mass: floor quotas plus one extra token to the "
    "largest remainders, so the quotas are integers that sum EXACTLY to "
    "the budget — the epoch planner that float rounding (quota = "
    "round(T·w)) gets off-by-a-few every time.",
)
def token_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All integer arithmetic: products and mods of BIGINTs, a rank over
    the bounded source dimension, no division at all. The same shape
    apportions shard counts, sampling quotas, or GPU-hour budgets —
    anywhere proportional integer allocation must be exact. Scale: one
    fact aggregate to source grain, then dimension-sized window work."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.ceil(F.col("n_chars") / 4.0).cast("bigint"))
        .cast("bigint")
        .alias("tokens")
    )
    tot = src.agg(F.sum("tokens").cast("bigint").alias("c"))
    base = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        F.expr(f"({APPORTION_BUDGET} * tokens) div c").cast("bigint").alias("floor_quota"),
        (F.lit(APPORTION_BUDGET) * F.col("tokens") % F.col("c"))
        .cast("bigint")
        .alias("remainder"),
    )
    short = base.agg(
        (F.lit(APPORTION_BUDGET) - F.sum("floor_quota")).cast("bigint").alias("k")
    )
    from pyspark.sql.window import Window as _W

    ranked = base.withColumn(
        "rr",
        F.row_number()
        .over(_W.orderBy(F.desc("remainder"), F.asc("source")))
        .cast("bigint"),
    )
    return ranked.crossJoin(F.broadcast(short)).select(
        "source",
        "tokens",
        "floor_quota",
        (
            F.col("floor_quota")
            + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    )


# ---------------------------------------------------------------------------
# Weighted priority sampling — quality-weighted corpus selection
# ---------------------------------------------------------------------------

#: Docs kept per source by the weighted sampler.
WEIGHTED_SAMPLE_K = 5


@register(
    "weighted_sample_priority",
    oracle=f"""
    WITH pri AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                    AS DOUBLE) / 4294967296.0 / n_chars AS priority
        FROM documents
        WHERE n_chars > 0
    )
    SELECT source, CAST(rank AS INT) AS rank, doc_id, weight,
           priority
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY priority, doc_id
        ) AS rank FROM pri
    ) WHERE rank <= {WEIGHTED_SAMPLE_K}
    """,
    doc=f"Weight-proportional deterministic sampling (hash-priority, the "
    "bottom-k-of-u/w scheme): each doc draws a uniform u from md5(id) "
    "and competes on priority u/weight — P(priority < t) = min(1, t·w), "
    "so small samples select ∝ weight (here n_chars: longer docs carry "
    f"more training tokens). Bottom-{WEIGHTED_SAMPLE_K} per source. "
    "Fully reproducible: no RNG state, no seed file — the sample is a "
    "pure function of doc ids, and the priority arithmetic is one hash, "
    "one division (exact IEEE ops, engine-portable; no pow/ln, which "
    "differ across math libraries at the last ulp).",
)
def weighted_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: priority is a scan-side expression; the only shuffle is the
    per-source top-k window (equivalently TakeOrderedAndProject per
    group). The same scheme streams: a new shard's docs compute their
    priorities independently and merge-sort into the standing sample —
    mergeable weighted sampling without coordination, which is what a
    1000-executor corpus selection actually needs. The full
    Efraimidis-Spirakis u^(1/w) key is the same plan shape; u/w is the
    small-probability approximation that stays transcendental-free for
    cross-engine exactness."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    pri = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("weight"),
        (u / F.col("n_chars")).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        pri.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= WEIGHTED_SAMPLE_K)
        .select("source", "rank", "doc_id", "weight", "priority")
    )


from etl_loading_scripts_spark.registry import REGISTRY as _REGISTRY  # noqa: E402

_SPLIT_CASE = (
    "CASE WHEN substr(md5(CAST({id} AS VARCHAR)), 1, 8) < '" + SPLIT_TRAIN_HEX + "'"
    " THEN 'train' WHEN substr(md5(CAST({id} AS VARCHAR)), 1, 8) < '"
    + SPLIT_VAL_HEX + "' THEN 'val' ELSE 'test' END"
)


@register(
    "split_leakage_audit",
    oracle=f"""
    WITH pairs AS ({_REGISTRY["dedup_ngram_jaccard"].oracle}),
    labeled AS (
        SELECT id_a, id_b,
               {_SPLIT_CASE.format(id='id_a')} AS split_a,
               {_SPLIT_CASE.format(id='id_b')} AS split_b
        FROM pairs
    )
    SELECT LEAST(split_a, split_b) || '-' || GREATEST(split_a, split_b)
               AS pair_split,
           CAST(split_a <> split_b AS INT) AS leaked,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM labeled GROUP BY 1, 2
    """,
    doc="Train/val/test LEAKAGE audit: every near-duplicate pair (exact "
    "n-gram Jaccard over the dedup threshold, the same pair set "
    "dedup_ngram_jaccard emits) is labeled with its endpoints' hash-"
    "assigned splits; cross-split pairs are LEAKED — a val/test doc "
    "whose near-twin sits in train inflates eval. Composes the "
    "registered pair pipeline and split rule verbatim, so the audit "
    "can never drift from the dedup or the splitter it audits.",
)
def split_leakage_audit(
    spark: SparkSession, sf_dir: str, shingled: DataFrame | None = None
) -> DataFrame:
    """The check every eval pipeline should run and most don't: random "
    "(here hash) splitting guarantees near-dup pairs straddle the
    boundary at rate 2·p_train·p_val+... — this audit measures it so the
    release can either re-assign leaked pairs to one side or drop them.
    Scale: rides the blocked candidate-pair computation the dedup
    already ran (candidate-bounded, never corpus²) plus two scan-side
    split labels and a 6-group rollup."""
    from etl_loading_scripts_spark.llm.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, shingled=shingled)

    def split_of(col):
        prefix = F.substring(F.md5(F.col(col).cast("string")), 1, 8)
        return (
            F.when(prefix < SPLIT_TRAIN_HEX, "train")
            .when(prefix < SPLIT_VAL_HEX, "val")
            .otherwise("test")
        )

    labeled = pairs.select(
        split_of("id_a").alias("split_a"), split_of("id_b").alias("split_b")
    )
    return (
        labeled.select(
            F.concat(
                F.least("split_a", "split_b"),
                F.lit("-"),
                F.greatest("split_a", "split_b"),
            ).alias("pair_split"),
            (F.col("split_a") != F.col("split_b")).cast("int").alias("leaked"),
        )
        .groupBy("pair_split", "leaked")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


