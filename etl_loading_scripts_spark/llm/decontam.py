"""Benchmark decontamination and sequence packing for training corpora.

Two operators every large-scale training-data pipeline runs downstream of
dedup:

- **decontamination** — flag corpus documents that share word-n-gram
  shingles with a held-out benchmark/eval set, so eval questions don't
  leak into training data (the published recipe: n-gram overlap against
  the benchmark, cf. GPT-3 / PaLM / Llama data cards).
- **sequence packing** — assign documents to fixed token-budget packs
  (context windows) with a deterministic cumulative-sum rule, the step
  that turns a document table into trainer-shaped batches.

Both are pure built-in expressions — codegen'd JVM execution, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.plancheck import broadcast_scalar, literal_table
from etl_loading_scripts_spark.llm.dedup import _SHINGLES_SQL_DUCK, _shingles_spark
from etl_loading_scripts_spark.registry import register

#: Every 20th doc_id plays the held-out benchmark set (deterministic split).
BENCH_MOD = 20
#: A corpus doc is contaminated when it shares ≥ this many distinct
#: shingles with the benchmark, or ≥ 1/4 of its own shingles.
CONTAM_ABS = 5
CONTAM_FRAC_DEN = 4

PACK_WINDOW = 512  # token budget per pack (context-window stand-in)


@register(
    "decontam_benchmark_overlap",
    oracle=f"""
    WITH shingled AS (
        {_SHINGLES_SQL_DUCK}
    ),
    bench AS (
        SELECT DISTINCT md5(unnest(shingles)) AS sh
        FROM shingled WHERE doc_id % {BENCH_MOD} = 0
    ),
    corpus AS (
        SELECT doc_id, md5(unnest(shingles)) AS sh
        FROM shingled WHERE doc_id % {BENCH_MOD} <> 0
    ),
    totals AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
        FROM corpus GROUP BY 1
    ),
    shared AS (
        SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM corpus c JOIN bench b ON c.sh = b.sh
        GROUP BY 1
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(s.n_shared, 0) AS n_shared,
           CAST(COALESCE(s.n_shared, 0) >= {CONTAM_ABS}
                OR COALESCE(s.n_shared, 0) * {CONTAM_FRAC_DEN} >= t.n_shingles
                AS BIGINT) AS contaminated
    FROM totals t LEFT JOIN shared s ON t.doc_id = s.doc_id
    """,
    doc="Benchmark decontamination: corpus docs sharing word-3-gram "
    "shingles with a held-out benchmark split are flagged (absolute + "
    "fractional overlap thresholds) — the eval-leakage gate that runs "
    "after dedup in published LLM data recipes.",
)
def decontam_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-hash inverted join, benchmark side broadcast.

    Scale: the benchmark set is eval-sized (thousands of docs) while the
    corpus is the 100 TB side — so the distinct benchmark-shingle set is
    a broadcast hash set and the corpus is scanned ONCE with a map-side
    semi-probe; the only shuffle is the per-doc groupBy on doc_id. Never
    joins corpus-to-corpus; cost is linear in corpus shingles."""
    docs = load_table(spark, sf_dir, "documents")
    # _shingles_spark materializes the arrays behind an aggregate barrier,
    # so the explode inside decontam_flags reads a stored column instead of
    # re-evaluating the shingle chain per row (see the barrier note there).
    return decontam_flags(_shingles_spark(docs))


def decontam_flags(shingle_table: DataFrame) -> DataFrame:
    """Contamination flags from a prepared shingle table ``(doc_id,
    shingles)`` — the composable core of ``decontam_benchmark_overlap``,
    so composed pipelines (``corpus_release_e2e``) can reuse one persisted
    shingle materialization across near-dedup AND decontamination."""
    shingled = (
        shingle_table
        .select("doc_id", F.explode("shingles").alias("s"))
        .select("doc_id", F.md5("s").alias("sh"))
    )
    bench = (
        shingled.filter(F.col("doc_id") % BENCH_MOD == 0).select("sh").distinct()
    )
    corpus = shingled.filter(F.col("doc_id") % BENCH_MOD != 0)
    per_doc = (
        corpus.join(F.broadcast(bench).withColumn("__hit__", F.lit(1)), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit__").alias("n_shared"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_shared",
        (
            (F.col("n_shared") >= CONTAM_ABS)
            | (F.col("n_shared") * CONTAM_FRAC_DEN >= F.col("n_shingles"))
        )
        .cast("bigint")
        .alias("contaminated"),
    )


@register(
    "pack_sequences_cumsum",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split_regex(lower(text), '\W+'),
                                    w -> w <> '')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                // {PACK_WINDOW} AS BIGINT) AS pack_id,
           CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                % {PACK_WINDOW} AS BIGINT) AS pack_offset
    FROM toks
    """,
    doc="Sequence packing: documents streamed per language into fixed "
    "token-budget packs by cumulative token count — pack_id/pack_offset "
    "say exactly where each doc lands in trainer context windows; "
    "deterministic (ordered by doc_id), so shardable and resumable.",
)
def pack_sequences_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous packing as a running-sum window: a doc's pack is
    ``floor(tokens_before_it / window)`` within its language stream.

    Scale: ONE shuffle — the window partitions by ``lang``; at 100 TB a
    mono-lingual corpus would skew one partition, in which case the
    two-phase range-bucket cumsum (same trick as
    ``allocate_surrogate_keys_partitioned``: per-bucket subtotal →
    broadcast running offsets → bucket-local window) replaces the single
    window; the per-lang shape here is the common multi-lingual case."""
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
    before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        (F.floor(before / PACK_WINDOW)).cast("long").alias("pack_id"),
        (before % PACK_WINDOW).cast("long").alias("pack_offset"),
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-space) decontamination
# ---------------------------------------------------------------------------

#: Every 50th vector plays the held-out benchmark embedding (deterministic
#: split, disjoint semantics from the n-gram split above).
EMB_BENCH_MOD = 50

#: Cosine threshold (per-mille) above which a corpus vector is flagged as
#: semantically contaminated by a benchmark item.
EMB_CONTAM_MILLE = 300  # synthetic vectors are near-orthogonal (cf. COSINE_DUP_THRESHOLD); real corpora use ~950

_EQVEC = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
_EQVEC_SPARK = "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
_EDOT_DUCK = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
_EDOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"


@register(
    "decontam_embedding_overlap",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, {_EQVEC} AS qv FROM embeddings
    ),
    n AS (
        SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS norm2 FROM q
    ),
    bench AS (SELECT * FROM n WHERE vec_id % {EMB_BENCH_MOD} = 0),
    corpus AS (SELECT * FROM n WHERE vec_id % {EMB_BENCH_MOD} <> 0),
    flagged AS (
        SELECT c.vec_id,
               CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
               MIN(b.vec_id) AS first_bench_id
        FROM corpus c JOIN bench b
          ON CAST({_EDOT_DUCK.format(a='c.qv', b='b.qv')} AS DOUBLE)
             > {EMB_CONTAM_MILLE / 1000.0}
               * sqrt(CAST(c.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))
        GROUP BY 1
    )
    SELECT vec_id, n_bench_hits, first_bench_id FROM flagged
    """,
    doc=f"Semantic decontamination: corpus embeddings whose cosine to ANY "
    f"held-out benchmark embedding exceeds 0.{EMB_CONTAM_MILLE} are "
    "flagged (hit count + first offending benchmark id) — the "
    "paraphrase-leak complement to n-gram decontam_benchmark_overlap, "
    "which literal-overlap checks can't catch. Threshold compared via "
    "cross-multiplication (dot > τ·|a||b|), no division.",
)
def decontam_embedding_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the benchmark side is small by construction (held-out evals
    are thousands of items, the corpus is billions) — broadcast it and
    the whole check is one map-side pass over the corpus, no shuffle
    until the per-doc hit aggregate. The quantized-int dot product keeps
    the threshold test bit-identical across engines; at production scale
    swap the brute-force broadcast for the IVF cell probe
    (`knn_join_ivf`) with this same flag rule."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.selectExpr("vec_id", f"{_EQVEC_SPARK} as qv").withColumn(
        "norm2",
        F.expr("aggregate(transform(qv, x -> x * x), 0L, (acc, x) -> acc + x)"),
    )
    bench = n.filter(F.col("vec_id") % EMB_BENCH_MOD == 0).select(
        F.col("vec_id").alias("bench_id"),
        F.col("qv").alias("bv"),
        F.col("norm2").alias("bn"),
    )
    corpus = n.filter(F.col("vec_id") % EMB_BENCH_MOD != 0)
    dot = F.expr(_EDOT_SPARK.format(a="qv", b="bv")).cast("double")
    thresh = (
        F.lit(EMB_CONTAM_MILLE / 1000.0)
        * F.sqrt(F.col("norm2").cast("double"))
        * F.sqrt(F.col("bn").cast("double"))
    )
    return (
        corpus.join(F.broadcast(bench), dot > thresh)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            F.min("bench_id").alias("first_bench_id"),
        )
    )


#: Context-window sizes swept by the packing-efficiency planner.
PACK_SWEEP = (256, 512, 1024)

_PACK_SWEEP_VALUES = ", ".join(f"({w})" for w in PACK_SWEEP)


@register(
    "packing_efficiency_sweep",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split_regex(lower(text), '\W+'),
                                    w -> w <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    lang_tot AS (
        SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens
        FROM toks GROUP BY 1
    ),
    windows(w) AS (VALUES {_PACK_SWEEP_VALUES})
    SELECT win.w AS window_tokens,
           CAST(SUM(lt.lang_tokens) AS BIGINT) AS corpus_tokens,
           CAST(SUM((lt.lang_tokens + win.w - 1) // win.w) AS BIGINT) AS n_packs,
           CAST(SUM(lt.lang_tokens) AS DOUBLE)
               / (SUM((lt.lang_tokens + win.w - 1) // win.w) * win.w)
               AS utilization
    FROM lang_tot lt CROSS JOIN windows win
    GROUP BY 1
    """,
    doc="Packing-efficiency sweep: for each candidate context-window size "
    f"({', '.join(map(str, PACK_SWEEP))} tokens), the pack count the "
    "per-language greedy cumsum packing (pack_sequences_cumsum) would "
    "produce and the resulting utilization — ceil-division per language "
    "stream, exact integers until one final ratio. The capacity-planning "
    "read that prices a context-length choice in wasted pad tokens "
    "BEFORE committing the trainer config.",
)
def packing_efficiency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contiguous packer's pack count per language is just
    ceil(lang_tokens / window) — so the sweep needs only the per-language
    token masses (one aggregate) crossed with the window literals, never
    a re-pack per candidate. Utilization < 1 is exactly the tail-pad
    waste of the last pack per language stream; the fragmentation
    WITHIN packs is packing_fragmentation_report's job."""
    docs = load_table(spark, sf_dir, "documents")
    lang_tot = docs.select(
        "lang",
        F.expr(
            r"cast(size(filter(split(lower(text), '\\W+'), w -> w <> '')) as long)"
        ).alias("n_tokens"),
    ).groupBy("lang").agg(F.sum("n_tokens").cast("bigint").alias("lang_tokens"))
    windows = literal_table(spark, [(w,) for w in PACK_SWEEP], "w INT")
    packs = F.expr("(lang_tokens + w - 1) div w")
    return (
        lang_tot.crossJoin(broadcast_scalar(windows))
        .groupBy(F.col("w").alias("window_tokens"))
        .agg(
            F.sum("lang_tokens").cast("bigint").alias("corpus_tokens"),
            F.sum(packs).cast("bigint").alias("n_packs"),
            (
                F.sum("lang_tokens").cast("double")
                / (F.sum(packs) * F.first(F.col("w")))
            ).alias("utilization"),
        )
    )
