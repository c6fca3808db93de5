"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Five families, each a standard large-corpus technique re-expressed as
shuffle-bounded DataFrame ops:

- **exact**       — md5(text) hash-groupBy; canonical = min doc_id.
- **MinHash-LSH** — shingle → k minhashes → b bands → bucket-join →
  candidate pairs → exact-Jaccard verify. The scale path for near-dedup:
  the cross product never materializes, only same-band buckets join.
- **n-gram Jaccard** — exact Jaccard on shared-shingle-blocked pairs
  (the LSH verifier run standalone with inverted-index blocking).
- **SimHash**     — 32-bit sign-sum sketch from md5 nibbles; Hamming-near
  docs land in identical/adjacent buckets.
- **embedding cosine** — near-dup by cosine over quantized vectors
  (see ``llm/similarity.py`` for the ANN variants).

Portability: every hash derives from md5 hex (DuckDB-computable); minhash
"hash family" h_i(s) = md5(i || '|' || s) compared lexicographically —
min-of-hex-string is engine-independent.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.plancheck import broadcast_scalar, literal_table
from etl_loading_scripts_spark.registry import register

_LOG = logging.getLogger(__name__)

N_MINHASH = 12
N_BANDS = 4  # 4 bands x 3 rows
ROWS_PER_BAND = N_MINHASH // N_BANDS
JACCARD_THRESHOLD = 0.3
#: Stop-shingle document-frequency cap for the exact inverted-index path:
#: a shingle appearing in more than this many documents is dropped from the
#: index (never from the Jaccard denominator) — one boilerplate shingle with
#: 10⁶ postings would otherwise self-join into 10¹² candidate pairs.
SHINGLE_DF_CAP = 64

_SHINGLES_SQL_DUCK = r"""
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(words) - 1),
                             i -> array_to_string(words[i:i+2], ' '))) AS shingles
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\W+'), w -> w <> '') AS words
            FROM documents
        )
        WHERE len(words) >= 3
"""


def _shingles_spark(docs: DataFrame, materialize: bool = True) -> DataFrame:
    """doc_id → distinct word-3-gram shingles (array<string>).

    Repartitions on doc_id first: the downstream shingle→md5 pipeline is
    CPU-bound per document, and a small input (few parquet splits) would
    otherwise pin all hashing on a handful of cores (measured 10× on
    local[32]). Shuffling the raw text once is far cheaper than
    under-parallelized hashing, and hash-partitioning by doc_id also
    co-partitions the candidate-pair verify joins that follow. At cluster
    scale input splits already ≈ cores and AQE coalesces the excess.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    words = F.expr(r"filter(split(lower(text), '\\W+'), w -> w <> '')")
    out = (
        docs.repartition(par, "doc_id")
        .select("doc_id", words.alias("words"))
        .filter(F.size("words") >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(words) - 2), "
                    "i -> concat_ws(' ', words[i-1], words[i], words[i+1]))"
                )
            ).alias("shingles"),
        )
    )
    if materialize:
        # MATERIALIZATION BARRIER, not a semantic step (doc_id is unique):
        # consumers that explode(shingles) otherwise get the whole
        # split→transform→distinct chain collapsed into the Generate and
        # re-evaluated per exploded row — measured 10-30× on the explode-
        # based dedup family at sf0.1. The aggregate forces the arrays to
        # materialize once per doc; its exchange reuses the doc_id hash
        # partitioning established above. Array-expression consumers
        # (minhash's aggregate lambdas) don't hit the Generate collapse —
        # they pass materialize=False and skip the extra aggregate.
        out = out.groupBy("doc_id").agg(F.first("shingles").alias("shingles"))
    return out


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, md5(text) AS content_hash FROM documents
    ),
    canon AS (
        SELECT content_hash, MIN(doc_id) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM hashed GROUP BY 1
    )
    SELECT h.doc_id, h.content_hash, c.canonical_id,
           c.group_size, h.doc_id <> c.canonical_id AS is_duplicate
    FROM hashed h JOIN canon c USING (content_hash)
    """,
    doc="Exact dedup: hash-groupBy on md5(text); every doc labeled with its "
    "canonical (min doc_id) representative and duplicate flag.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: ONE shuffle on the 128-bit content hash — the canonical
    100 TB exact-dedup plan. The canon side aggregates to distinct hashes
    (≤ corpus), joined back hash-partitioned; AQE broadcast-joins it if the
    dup-group table turns out small."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select("doc_id", F.md5("text").alias("content_hash"))
    canon = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return hashed.join(canon, "content_hash").select(
        "doc_id",
        "content_hash",
        "canonical_id",
        "group_size",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


# 12 independent 32-bit hash functions from THREE md5 evaluations per
# shingle: md5(prefix_j || s) yields 32 hex chars = four 8-char chunks,
# each an independent uniform hash. Lexicographic min over fixed-width hex
# = numeric min — a valid minhash family at 1/4 the hashing cost. The md5
# arrays are materialized ONCE per doc (hash0-2 columns) because Spark does
# no common-subexpression elimination across lambda expressions — inlining
# md5 into each of the 12 min exprs would evaluate it 12x.
_MH_PREFIXES = ("", "x|", "y|")
_CHUNKS_PER_MD5 = 4


def _mh_index(i: int) -> tuple[int, int]:
    return i // _CHUNKS_PER_MD5, (i % _CHUNKS_PER_MD5) * 8 + 1


def _hash_array_exprs_spark():
    return [
        F.expr(f"transform(shingles, s -> md5(concat('{p}', s)))").alias(f"hash{j}")
        for j, p in enumerate(_MH_PREFIXES)
    ]


def _hash_array_exprs_duck() -> str:
    return ",\n               ".join(
        f"list_transform(shingles, s -> md5(concat('{p}', s))) AS hash{j}"
        for j, p in enumerate(_MH_PREFIXES)
    )


def _minhash_exprs_spark():
    out = []
    for i in range(N_MINHASH):
        j, pos = _mh_index(i)
        out.append(
            F.expr(f"array_min(transform(hash{j}, x -> substring(x, {pos}, 8)))").alias(
                f"mh{i}"
            )
        )
    return out


def _minhash_exprs_duck() -> str:
    parts = []
    for i in range(N_MINHASH):
        j, pos = _mh_index(i)
        parts.append(
            f"list_min(list_transform(hash{j}, x -> substr(x, {pos}, 8))) AS mh{i}"
        )
    return ",\n               ".join(parts)


def _band_keys_spark():
    cols = []
    for b in range(N_BANDS):
        parts = [f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band{b}"))
    return cols


def _band_keys_duck() -> str:
    outs = []
    for b in range(N_BANDS):
        parts = ", ".join(f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        outs.append(f"md5(concat_ws('|', {parts})) AS band{b}")
    return ",\n               ".join(outs)


_MINHASH_ORACLE = f"""
    WITH shingled AS ({_SHINGLES_SQL_DUCK}),
    hashed AS (
        SELECT doc_id, shingles,
               {_hash_array_exprs_duck()}
        FROM shingled
    ),
    sigs AS (
        SELECT doc_id, shingles,
               {_minhash_exprs_duck()}
        FROM hashed
    ),
    banded AS (
        SELECT doc_id, shingles,
               {_band_keys_duck()}
        FROM sigs
    ),
    band_long AS (
        SELECT doc_id, b.band, b.key
        FROM banded,
        LATERAL (VALUES (0, band0), (1, band1), (2, band2), (3, band3)) AS b(band, key)
    ),
    candidates AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band_long a JOIN band_long b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    verified AS (
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
               (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
        FROM candidates c
        JOIN shingled sa ON c.id_a = sa.doc_id
        JOIN shingled sb ON c.id_b = sb.doc_id
    )
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    doc=f"MinHash({N_MINHASH})+LSH({N_BANDS}x{ROWS_PER_BAND}): shingle → "
    "minhash signature → band buckets → same-bucket candidate pairs → "
    "exact-Jaccard verification ≥ threshold. The near-dedup scale path.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the only joins are (band, key) bucket self-joins — candidate
    count is bounded by bucket sizes, never |corpus|². At 100 TB: shingle+
    signature pass is map-only; band explode multiplies rows by 4; the
    bucket join shuffles on (band, key). Hot buckets (boilerplate docs) are
    the skew risk → AQE skew-join handles, or raise bands/rows.

    Min-of-md5-hex is a valid minhash family: lexicographic order on hex =
    numeric order on the underlying 128-bit value, identical in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    shingled = _shingles_spark(docs, materialize=False)
    return minhash_lsh_pairs(shingled)


def minhash_lsh_pairs(shingled: DataFrame) -> DataFrame:
    """MinHash-LSH verified near-dup pairs from a prepared shingle table
    ``(doc_id, shingles)`` — the composable core of ``dedup_minhash_lsh``.

    Taking the shingle table as input (rather than re-deriving it from the
    corpus) lets composed pipelines (``corpus_release_e2e``) shingle the
    corpus ONCE, persist it, and feed both this pair graph and the
    decontamination probe from the same materialization — at 100 TB
    shingling is the dominant CPU cost and must not be paid twice."""
    hashed = shingled.select("doc_id", "shingles", *_hash_array_exprs_spark())
    sigs = hashed.select("doc_id", *_minhash_exprs_spark())
    banded = sigs.select("doc_id", *_band_keys_spark())
    # band buckets carry ONLY doc_ids — shuffling the shingle arrays 4x
    # through the bucket join would dominate the runtime; arrays are joined
    # back below for just the candidate pairs (tiny vs corpus).
    band_long = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("key"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = band_long.select(F.col("doc_id").alias("id_a"), "band", "key")
    b = band_long.select(F.col("doc_id").alias("id_b"), "band", "key")
    candidates = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = candidates.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard with inverted-index blocking
# ---------------------------------------------------------------------------


def blocked_shingle_pair_counts(
    docs: DataFrame,
    df_cap: int = SHINGLE_DF_CAP,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, n_shared, n_a, n_b) for every doc pair sharing ≥1
    indexed shingle — the shared blocking core of the Jaccard and
    containment scorers.

    Scale: |pairs| is Σ postings² over shingle buckets. The cap bounds the
    worst bucket — shingles with document frequency > ``df_cap`` are
    removed from the index before the self-join, so no posting list
    exceeds ``df_cap`` and pair growth is ≤ |shingles|·df_cap². Set
    similarity DENOMINATORS still use full per-doc shingle counts; only
    ``n_shared`` ignores capped shingles, so scores are a lower bound
    (pairs that overlap solely on boilerplate drop out — the point).
    The dropped-shingle count is computed and logged: no silent caps.

    ``shingled`` lets a composed pipeline (corpus_release_manifest) pass
    its PERSISTED shingle table so the corpus is shingled once across
    every consumer (r15 — VERDICT r14 item 6, guide §5 multi-consumer
    intermediate); standalone callers derive it here as before.
    """
    if shingled is None:
        shingled = _shingles_spark(docs)
    exploded = shingled.select(
        "doc_id", F.explode("shingles").alias("shingle"), F.size("shingles").alias("n_sh")
    )
    hot = (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("shingle")
    )
    n_hot = hot.count()  # one scalar to the driver — the price of an honest cap
    if n_hot:
        _LOG.warning(
            "dedup_ngram_jaccard: dropping %d stop-shingles with document "
            "frequency > %d from the inverted index",
            n_hot,
            df_cap,
        )
    # anti-join is hash-equality; AQE broadcasts the hot list when small
    # (by construction it is: ≤ |postings| / df_cap shingles)
    kept = exploded.join(hot, "shingle", "left_anti")
    a = kept.select(
        F.col("doc_id").alias("id_a"), "shingle", F.col("n_sh").alias("n_a")
    )
    b = kept.select(
        F.col("doc_id").alias("id_b"), "shingle", F.col("n_sh").alias("n_b")
    )
    pair_counts = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    return pair_counts


def ngram_jaccard_pairs(
    docs: DataFrame,
    df_cap: int = SHINGLE_DF_CAP,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard over the blocked pair core
    (VERDICT r1 item 4 — see :func:`blocked_shingle_pair_counts`;
    ``shingled`` threads a composed pipeline's persisted shingle table
    through, r15)."""
    pair_counts = blocked_shingle_pair_counts(docs, df_cap, shingled=shingled)
    jac = F.col("n_shared").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        pair_counts.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH shingled AS ({_SHINGLES_SQL_DUCK}),
    exploded AS (
        SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS n_sh
        FROM shingled
    ),
    hot AS (
        SELECT shingle FROM exploded
        GROUP BY shingle HAVING COUNT(*) > {SHINGLE_DF_CAP}
    ),
    kept AS (
        SELECT * FROM exploded
        WHERE shingle NOT IN (SELECT shingle FROM hot)
    ),
    pair_counts AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared,
               ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b
        FROM kept a JOIN kept b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared,
           CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) AS jaccard
    FROM pair_counts
    WHERE CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) >= {JACCARD_THRESHOLD}
    """,
    doc="Exact n-gram Jaccard with inverted-index blocking + stop-shingle "
    f"capping (document frequency > {SHINGLE_DF_CAP} drops out of the "
    "index): only pairs sharing ≥1 indexed shingle are scored.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# SimHash (32-bit sign-sum sketch)
# ---------------------------------------------------------------------------

_NIBBLE_HIGH = "('8','9','a','b','c','d','e','f')"


def _simhash_bits_duck() -> str:
    # bit i of token-hash = high bit of the i-th hex nibble of md5(token)
    terms = []
    for i in range(32):
        terms.append(
            f"SUM(CASE WHEN substr(h, {i + 1}, 1) IN {_NIBBLE_HIGH} THEN 1 ELSE -1 END)"
            f" AS s{i}"
        )
    return ",\n               ".join(terms)


def _simhash_assemble_duck() -> str:
    return " + ".join(f"(CASE WHEN s{i} >= 0 THEN (1::BIGINT << {i}) ELSE 0 END)" for i in range(32))


def _simhash_sketch_ctes_duck() -> str:
    """The shared shingle→token→bitsum→sketch CTE chain (doc_id, simhash)."""
    return f"""shingled AS ({_SHINGLES_SQL_DUCK}),
    tokens AS (
        SELECT doc_id, md5(unnest(shingles)) AS h FROM shingled
    ),
    bitsums AS (
        SELECT doc_id,
               {_simhash_bits_duck()}
        FROM tokens GROUP BY doc_id
    ),
    sketches AS (
        SELECT doc_id, CAST({_simhash_assemble_duck()} AS BIGINT) AS simhash
        FROM bitsums
    )"""


def _simhash_sketches_spark(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit sign-sum sketch, one shuffle on doc_id."""
    shingled = _shingles_spark(docs)
    tokens = shingled.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", F.md5("s").alias("h")
    )
    bit_sums = [
        F.sum(
            F.when(F.substring("h", i + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(32)
    ]
    bitsums = tokens.groupBy("doc_id").agg(*bit_sums)
    assemble = None
    for i in range(32):
        term = F.when(F.col(f"s{i}") >= 0, F.lit(1).cast("long") * (1 << i)).otherwise(
            F.lit(0).cast("long")
        )
        assemble = term if assemble is None else assemble + term
    return bitsums.select("doc_id", assemble.cast("long").alias("simhash"))


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {_simhash_sketch_ctes_duck()},
    groups AS (
        SELECT simhash, MIN(doc_id) AS canonical_id, CAST(COUNT(*) AS BIGINT) AS group_size
        FROM sketches GROUP BY 1
    )
    SELECT s.doc_id, s.simhash, g.canonical_id, g.group_size
    FROM sketches s JOIN groups g USING (simhash)
    """,
    doc="SimHash: 32-bit sign-sum sketch over shingle hashes (bit i = high "
    "bit of md5 nibble i); identical sketches → near-dup group.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: explode(shingles) → per-(doc, bit) partial sums — one shuffle
    on doc_id; the 32 bit-sums are a single wide aggregate (map-side
    combined). Exact-match grouping here; Hamming-banded near-match is
    ``dedup_simhash_near``."""
    docs = load_table(spark, sf_dir, "documents")
    sketches = _simhash_sketches_spark(docs)
    groups = sketches.groupBy("simhash").agg(
        F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return sketches.join(groups, "simhash").select(
        "doc_id", "simhash", "canonical_id", "group_size"
    )


HAMMING_MAX = 6  # near-dup bound; banding guarantees recall only to 3
# (pigeonhole over 4 bytes) — distances 4-6 are best-effort, identically so
# in both engines because the oracle replicates the same banding.


@register(
    "dedup_simhash_near",
    oracle=f"""
    WITH {_simhash_sketch_ctes_duck()},
    bands AS (
        SELECT doc_id, b.band, (simhash >> (8 * b.band)) & 255 AS byte
        FROM sketches, LATERAL (VALUES (0), (1), (2), (3)) AS b(band)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN sketches sa ON sa.doc_id = c.id_a
    JOIN sketches sb ON sb.doc_id = c.id_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {HAMMING_MAX}
    """,
    doc=f"SimHash near-match: 32-bit sketch split into 4 byte-bands; docs "
    "sharing any band byte become candidates (pigeonhole: Hamming ≤ 3 is "
    f"guaranteed caught), verified by bit_count(xor) ≤ {HAMMING_MAX}.",
)
def dedup_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Manku-et-al web-dedup plan: band join bounds the candidate set
    by byte-bucket sizes (256 values per band ⇒ ~N²/1024 worst case on
    random sketches, far less on real corpora), XOR+popcount verification
    is a codegen'd integer op — no arrays move through the verify join,
    only (doc_id, simhash) pairs. Same ids-only discipline as the MinHash
    banding."""
    docs = load_table(spark, sf_dir, "documents")
    sketches = _simhash_sketches_spark(docs).localCheckpoint()
    bands = sketches.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band"),
    ).select(
        "doc_id",
        "band",
        F.expr("shiftright(simhash, band * 8) & 255").alias("byte"),
    )
    a = bands.select(F.col("doc_id").alias("id_a"), "band", "byte")
    b = bands.select(F.col("doc_id").alias("id_b"), "band", "byte")
    cand = (
        a.join(b, ["band", "byte"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sketches.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    sb = sketches.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (quantized, exact integer dot products)
# ---------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.3  # synthetic vectors are near-orthogonal; real
# corpora use ~0.95+. Threshold is a knob, the plan is the point.

_QVEC_DUCK = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, label, {_QVEC_DUCK} AS qv
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, label, qv,
               list_sum(list_transform(qv, x -> x * x)) AS norm2
        FROM q
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS DOUBLE)
               / sqrt(CAST(a.norm2 AS DOUBLE)) / sqrt(CAST(b.norm2 AS DOUBLE)) AS cosine
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS DOUBLE)
               / sqrt(CAST(a.norm2 AS DOUBLE)) / sqrt(CAST(b.norm2 AS DOUBLE))
          >= {COSINE_DUP_THRESHOLD}
    """,
    doc="Embedding near-dup: cosine over integer-quantized vectors "
    "(round(x*1e6)::bigint) within label blocks — exact integer dot "
    "products, bit-identical across engines.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: blocking by ``label`` (≙ cluster/partition id in a real
    pipeline) bounds the pair count per block; the quantized dot is a
    zip_with/aggregate over int64 — exact, no float-order sensitivity.
    Unblocked all-pairs at 100 TB is never run — see llm/similarity.py for
    the ANN path."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
        ).alias("qv"),
    )
    n = q.withColumn(
        "norm2", F.expr("aggregate(transform(qv, x -> x * x), 0L, (acc, x) -> acc + x)")
    )
    a = n.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label"), F.col("qv").alias("qa"), F.col("norm2").alias("na")
    )
    b = n.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label"), F.col("qv").alias("qb"), F.col("norm2").alias("nb")
    )
    dot = F.expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, x) -> acc + x)")
    cosine = dot.cast("double") / F.sqrt(F.col("na").cast("double")) / F.sqrt(
        F.col("nb").cast("double")
    )
    return (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Near-dup clusters: connected components over the LSH pair graph
# ---------------------------------------------------------------------------


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        {_MINHASH_ORACLE}
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ),
    walk(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id,
           CAST(MIN(label) AS BIGINT) AS cluster_id,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_reachable
    FROM walk GROUP BY node
    """,
    doc="Connected components over the MinHash-LSH duplicate-pair graph: "
    "every near-dup doc labeled with its cluster (min doc_id in the "
    "component) — the step that turns pairwise dedup into keep-one-per-"
    "cluster. Iterative min-label propagation (no closed SQL form in "
    "Spark; the oracle uses DuckDB's recursive CTE).",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-loop label propagation: labels start as doc_id; each round
    every node takes min(own, neighbors' labels); stop when no label
    changes. Rounds = graph diameter (near-dup clusters are shallow —
    single digits in practice).

    Scale: each round is one shuffle-join of (edges ⋈ labels) + a groupBy
    min — both partition on the same key. localCheckpoint truncates the
    per-round lineage so round N's plan doesn't replay rounds 1..N-1 (on a
    cluster use checkpoint() to a reliable dir instead). The convergence
    test is a count() scalar per round — driver sees one number, never
    rows. For graphs with whale components, use
    :func:`dedup_clusters_bigstar` — the large-star/small-star variant
    (same join primitives, log-diameter rounds)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).toDF("src", "dst").localCheckpoint()
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()

    while True:
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break

    # n_reachable mirrors the oracle's closure size: nodes whose label can
    # reach this node = component size (labels all equal cluster min, so
    # count distinct reachable labels == component size)
    comp_size = labels.groupBy("label").agg(F.count(F.lit(1)).alias("comp_n"))
    return (
        labels.join(comp_size, "label")
        .select(
            F.col("node").alias("doc_id"),
            F.col("label").cast("long").alias("cluster_id"),
            F.col("comp_n").cast("long").alias("n_reachable"),
        )
    )


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 50
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    The whale-component-safe alternative to plain min-label propagation
    (:func:`dedup_clusters`): rounds grow with ``log(diameter)`` instead of
    the diameter itself, because every round re-points whole neighborhoods
    at their local minimum rather than moving labels one hop. The public
    two-operation formulation (Kiveris et al., "Connected Components in
    MapReduce and Beyond"):

    - **large-star**: each node links its LARGER neighbors to its smallest
      neighborhood member — ``emit (v, min(N(u) ∪ {u}))`` for ``v > u``.
    - **small-star**: on ``u > v``-oriented edges, each node links itself
      and its smaller neighbors to the minimum — collapsing local chains.

    Both are one groupBy + one self-join on the same key, so each round is
    two key-partitioned shuffles with no driver-side data. Convergence =
    the oriented edge set reaches a fixed point (every node points straight
    at its component min); checked with a two-sided ``exceptAll`` count —
    scalars only on the driver.

    Returns ``(node, label)`` where label is the component minimum.
    """
    sym0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    nodes = (
        sym0.select("u").union(sym0.select("v")).distinct().toDF("node")
        .localCheckpoint()
    )
    # orient u > v
    cur = (
        sym0.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )

    for _ in range(max_rounds):
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            sym.join(mins, "u")
            .withColumn("m", F.least("mn", "u"))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mins_s = large.groupBy("u").agg(F.min("v").alias("m"))
        joined = large.join(mins_s, "u")
        small = (
            joined.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        if small.exceptAll(cur).count() == 0 and cur.exceptAll(small).count() == 0:
            cur = small
            break
        cur = small

    direct = cur.groupBy("u").agg(F.min("v").alias("label"))
    return nodes.join(direct, nodes.node == direct.u, "left").select(
        "node", F.coalesce("label", "node").alias("label")
    )


@register(
    "dedup_clusters_bigstar",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        {_MINHASH_ORACLE}
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ),
    walk(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id,
           CAST(MIN(label) AS BIGINT) AS cluster_id,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_reachable
    FROM walk GROUP BY node
    """,
    doc="Connected components over the MinHash-LSH pair graph via "
    "alternating large-star/small-star — identical clustering to "
    "dedup_clusters, but rounds scale with log(diameter), the "
    "whale-component-safe plan at 100 TB. Oracle: the same recursive-CTE "
    "closure (the algorithm must agree with plain reachability).",
)
def dedup_clusters_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as :func:`dedup_clusters`, star-algorithm engine.

    Scale: per round two key-partitioned shuffles (groupBy min + re-join),
    edge rows only — no label table carried alongside, no whole-component
    fan-in to one task; a path graph of length 2^k collapses in ~k rounds
    vs 2^k for label propagation."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    labels = connected_components_star(pairs, src="id_a", dst="id_b")
    comp_size = labels.groupBy("label").agg(F.count(F.lit(1)).alias("comp_n"))
    return labels.join(comp_size, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").cast("long").alias("cluster_id"),
        F.col("comp_n").cast("long").alias("n_reachable"),
    )


_FLIPS = [0] + [1 << j for j in range(8)]  # the byte itself + 8 one-bit flips


@register(
    "dedup_simhash_multiprobe",
    oracle=f"""
    WITH {_simhash_sketch_ctes_duck()},
    bands AS (
        SELECT doc_id, b.band, (simhash >> (8 * b.band)) & 255 AS byte
        FROM sketches, LATERAL (VALUES (0), (1), (2), (3)) AS b(band)
    ),
    probes AS (
        SELECT doc_id, band, xor(byte, f.flip) AS byte
        FROM bands, LATERAL unnest([{", ".join(str(f) for f in _FLIPS)}]) AS f(flip)
    ),
    cand AS (
        SELECT DISTINCT p.doc_id AS id_a, b.doc_id AS id_b
        FROM probes p JOIN bands b
          ON p.band = b.band AND p.byte = b.byte AND p.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
    FROM cand c
    JOIN sketches sa ON sa.doc_id = c.id_a
    JOIN sketches sb ON sb.doc_id = c.id_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {HAMMING_MAX}
    """,
    doc="Multiprobe SimHash: each band byte additionally probes its 8 "
    "one-bit neighbors, so any pair with ≤1 differing bit in SOME band is "
    "a candidate — guaranteed recall to Hamming 7 (pigeonhole over 4 "
    "bands) vs 3 for exact-bucket banding, at ~9× probe rows.",
)
def dedup_simhash_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe trades bounded extra probe rows for recall instead of
    adding hash tables (more memory) or widening buckets (more false
    candidates) — the standard knob when near-dup quality SLAs tighten.
    Probe rows stay ids-only; the ≤-verify is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    sketches = _simhash_sketches_spark(docs).localCheckpoint()
    bands = sketches.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band"),
    ).select(
        "doc_id",
        "band",
        F.expr("shiftright(simhash, band * 8) & 255").alias("byte"),
    )
    flips = ", ".join(str(f) for f in _FLIPS)
    probes = bands.select(
        F.col("doc_id").alias("id_a"),
        "band",
        F.explode(F.expr(f"transform(array({flips}), f -> byte ^ f)")).alias("byte"),
    )
    b = bands.select(F.col("doc_id").alias("id_b"), "band", "byte")
    cand = (
        probes.join(b, ["band", "byte"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sketches.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    sb = sketches.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("id_a", "id_b", "hamming")
    )


#: Directional-containment threshold: max(c_ab, c_ba) ≥ this flags a pair
#: even when symmetric Jaccard stays low (short doc quoted inside long doc).
CONTAINMENT_THRESHOLD = 0.5


@register(
    "dedup_ngram_containment",
    oracle=f"""
    WITH shingled AS ({{shingles}}),
    exploded AS (
        SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS n_sh
        FROM shingled
    ),
    hot AS (
        SELECT shingle FROM exploded
        GROUP BY shingle HAVING COUNT(*) > {{cap}}
    ),
    kept AS (
        SELECT * FROM exploded
        WHERE shingle NOT IN (SELECT shingle FROM hot)
    ),
    pair_counts AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared,
               ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b
        FROM kept a JOIN kept b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared,
           CAST(n_shared AS DOUBLE) / n_a AS containment_a,
           CAST(n_shared AS DOUBLE) / n_b AS containment_b
    FROM pair_counts
    WHERE CAST(n_shared AS DOUBLE) / LEAST(n_a, n_b) >= {CONTAINMENT_THRESHOLD}
    """.format(shingles=_SHINGLES_SQL_DUCK, cap=SHINGLE_DF_CAP),
    doc="Directional n-gram containment |A∩B|/|A| over the same blocked "
    "pair core as Jaccard: catches a short document quoted inside a long "
    "one, where symmetric Jaccard is diluted by the length gap "
    f"(flag when either direction ≥ {CONTAINMENT_THRESHOLD}).",
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same blocked pair counts, different decision rule — the asymmetric
    complement of dedup_ngram_jaccard (a 100-shingle doc fully inside a
    2000-shingle doc scores Jaccard 0.05 but containment 1.0). Cost is
    identical: the scorer is a projection over the already-bounded pair
    set."""
    pair_counts = blocked_shingle_pair_counts(load_table(spark, sf_dir, "documents"))
    c_a = F.col("n_shared").cast("double") / F.col("n_a")
    c_b = F.col("n_shared").cast("double") / F.col("n_b")
    return (
        pair_counts.filter(F.greatest(c_a, c_b) >= CONTAINMENT_THRESHOLD)
        .select(
            "id_a",
            "id_b",
            "n_shared",
            c_a.alias("containment_a"),
            c_b.alias("containment_b"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental MinHash LSH: delta-vs-index probe
# ---------------------------------------------------------------------------

#: Deterministic corpus split standing in for "today's arrivals": doc_id
#: ≡ 0 (mod 5) is the delta batch, everything else is the already-indexed
#: corpus.
DELTA_MOD = 5


@register(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH shingled AS ({_SHINGLES_SQL_DUCK}),
    hashed AS (
        SELECT doc_id, shingles,
               {_hash_array_exprs_duck()}
        FROM shingled
    ),
    sigs AS (
        SELECT doc_id, shingles,
               {_minhash_exprs_duck()}
        FROM hashed
    ),
    banded AS (
        SELECT doc_id, shingles,
               {_band_keys_duck()}
        FROM sigs
    ),
    band_long AS (
        SELECT doc_id, b.band, b.key
        FROM banded,
        LATERAL (VALUES (0, band0), (1, band1), (2, band2), (3, band3)) AS b(band, key)
    ),
    candidates AS (
        SELECT DISTINCT d.doc_id AS delta_id, x.doc_id AS index_id
        FROM band_long d JOIN band_long x
          ON d.band = x.band AND d.key = x.key
         AND d.doc_id % {DELTA_MOD} = 0 AND x.doc_id % {DELTA_MOD} <> 0
    ),
    verified AS (
        SELECT c.delta_id, c.index_id,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
               (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
        FROM candidates c
        JOIN shingled sa ON c.delta_id = sa.doc_id
        JOIN shingled sb ON c.index_id = sb.doc_id
    )
    SELECT delta_id, index_id, jaccard FROM verified
    WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    doc="Incremental near-dedup: the arriving delta batch (doc_id ≡ 0 mod "
    f"{DELTA_MOD}) is MinHash-banded and probed against the indexed "
    "corpus's band buckets ONLY — no index×index pairs are ever formed. "
    "Emits (delta_id, index_id, jaccard ≥ threshold): the delta documents "
    "that collide with something already ingested.",
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape for continuously-ingested corpora: re-running
    full-corpus LSH per day is O(corpus) every day; the incremental probe
    is O(delta). The band-key table for the index side is computed once
    and PERSISTED (parquet bucketed by (band, key) — `sources.write_bucketed`
    gives a shuffle-free probe join); here both sides derive from the same
    table because the oracle harness is stateless, but the plan only forms
    delta×index candidates, which is the property that matters: cost
    follows the day's arrivals, not corpus history. Accepted delta docs
    append their band keys to the index for tomorrow — the signature store
    is mergeable state, like every sketch in this engine.

    Cites the same LSH constants as `dedup_minhash_lsh` (4 bands × 3
    rows), so a delta doc collides here iff the full-corpus run would
    have paired it with an indexed doc."""
    docs = load_table(spark, sf_dir, "documents")
    shingled = _shingles_spark(docs, materialize=False)
    hashed = shingled.select("doc_id", "shingles", *_hash_array_exprs_spark())
    sigs = hashed.select("doc_id", *_minhash_exprs_spark())
    banded = sigs.select("doc_id", *_band_keys_spark())
    band_long = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("key"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    delta = band_long.filter(F.col("doc_id") % DELTA_MOD == 0).select(
        F.col("doc_id").alias("delta_id"), "band", "key"
    )
    index = band_long.filter(F.col("doc_id") % DELTA_MOD != 0).select(
        F.col("doc_id").alias("index_id"), "band", "key"
    )
    candidates = (
        delta.join(index, ["band", "key"]).select("delta_id", "index_id").distinct()
    )
    sh_d = shingled.select(F.col("doc_id").alias("delta_id"), F.col("shingles").alias("sh_d"))
    sh_x = shingled.select(F.col("doc_id").alias("index_id"), F.col("shingles").alias("sh_x"))
    inter = F.size(F.array_intersect("sh_d", "sh_x"))
    union = F.size("sh_d") + F.size("sh_x") - inter
    return (
        candidates.join(sh_d, "delta_id")
        .join(sh_x, "index_id")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("delta_id", "index_id", "jaccard")
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    WITH hashed AS (
        SELECT source, md5(text) AS h FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE) / COUNT(*) AS dup_rate
    FROM hashed GROUP BY 1
    """,
    doc="Per-source exact-duplicate rate: (docs, unique contents, "
    "duplicate fraction) per source — the corpus-quality dashboard row "
    "that decides which sources need aggressive dedup before mixing.",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one groupBy(source) with a distinct-count over content
    hashes — Spark expands COUNT(DISTINCT) into a two-phase aggregate
    ((source, h) partial dedup, then per-source merge), so no source's
    full document set ever colocates on one task. The rate divides two
    exact integers. Feeds `sample_mixture_topk` weights: a source at 40%
    dup_rate contributes ~0.6× its nominal token budget after dedup."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select("source", F.md5("text").alias("h"))
    return hashed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_unique"),
        (
            (F.count(F.lit(1)) - F.countDistinct("h")).cast("double")
            / F.count(F.lit(1))
        ).alias("dup_rate"),
    )


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        {_MINHASH_ORACLE}
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
    ),
    clusters AS (
        SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
        FROM walk GROUP BY node
    ),
    sized AS (
        SELECT c.cluster_id, c.doc_id,
               CAST(len(list_filter(string_split_regex(lower(d.text), '\\W+'),
                                    w -> w <> '')) AS BIGINT) AS n_words
        FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT cluster_id,
           doc_id AS kept_doc_id,
           n_words AS kept_n_words,
           CAST(n_in_cluster AS BIGINT) AS n_in_cluster
    FROM (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY cluster_id ORDER BY n_words DESC, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY cluster_id) AS n_in_cluster
        FROM sized
    ) WHERE rn = 1
    """,
    doc="Representative selection for near-dup clusters: instead of the "
    "keep-min-id rule, each cluster keeps its LONGEST document (word "
    "count, ties to smaller id) — the quality-aware variant used when "
    "near-dups differ in truncation/boilerplate and you want the fullest "
    "copy in the corpus.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes `dedup_clusters` (connected components over the LSH pair
    graph) with per-doc length: one join of the cluster labels to word
    counts, one per-cluster window. Scale: clusters are a vanishing
    fraction of the corpus (only docs that appear in a near-dup pair),
    so everything after the CC step is small; the window partitions by
    cluster_id. The keep rule is a pluggable ORDER BY — swap word count
    for a quality score (`text_quality_score`) or recency without
    touching the plan shape."""
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    docs = load_table(spark, sf_dir, "documents")
    sized = clusters.join(docs, "doc_id").select(
        "cluster_id",
        "doc_id",
        F.size(
            F.expr(r"filter(split(lower(text), '\\W+'), w -> w <> '')")
        ).cast("long").alias("n_words"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("n_words").desc(), "doc_id")
    wc = Window.partitionBy("cluster_id")
    return (
        sized.withColumn("rn", F.row_number().over(w))
        .withColumn("n_in_cluster", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("n_words").alias("kept_n_words"),
            F.col("n_in_cluster").cast("long").alias("n_in_cluster"),
        )
    )


# ---------------------------------------------------------------------------
# Chunk-level (pseudo-paragraph) boilerplate dedup — round 3
# ---------------------------------------------------------------------------

#: Fixed chunk width (words) standing in for paragraphs/lines: the test
#: corpus has no newline structure, so chunking is positional; on real
#: documents the splitter is `split(text, '\n\n')` with the SAME pipeline
#: below (hash → corpus document-frequency → per-doc ratio).
CHUNK_WORDS = 10
#: A chunk appearing in at least this many DISTINCT docs is boilerplate.
CHUNK_BOILER_DF = 2


@register(
    "dedup_paragraph_boilerplate",
    oracle=rf"""
    WITH words AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\W+'), w -> w <> '') AS ws
        FROM documents
    ),
    chunk_idx AS (
        SELECT doc_id, ws,
               unnest(range(0, CAST(ceil(len(ws) / {CHUNK_WORDS}.0) AS INT))) AS i
        FROM words WHERE len(ws) > 0
    ),
    chunks AS (
        SELECT doc_id,
               md5(array_to_string(ws[(i * {CHUNK_WORDS} + 1):(i * {CHUNK_WORDS} + {CHUNK_WORDS})], ' ')) AS h
        FROM chunk_idx
    ),
    dfreq AS (
        SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM chunks GROUP BY 1
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN d.n_docs >= {CHUNK_BOILER_DF} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           CAST(SUM(CASE WHEN d.n_docs >= {CHUNK_BOILER_DF} THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS boiler_ratio
    FROM chunks c JOIN dfreq d USING (h)
    GROUP BY 1
    """,
    doc=f"Paragraph/line-level boilerplate dedup (CCNet/RefinedWeb shape): "
    f"docs chunked into {CHUNK_WORDS}-word units, each chunk hashed, "
    f"chunks appearing in ≥{CHUNK_BOILER_DF} distinct docs flagged as "
    "boilerplate; per-doc chunk counts and boilerplate ratio — the "
    "sub-document dedup that whole-doc hashing cannot see.",
)
def dedup_paragraph_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the chunk table is corpus-linear (|words|/chunk_width rows,
    ids+16-byte hashes only); document frequency is ONE hash aggregate on
    the chunk hash; the join back is hash-partitioned on the same key.
    Identical plan family to `dedup_exact`, one grain finer — no
    all-pairs anything. The md5 arrays materialize once per doc behind
    the transform (no per-exploded-row re-evaluation: the explode input
    IS the array column)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.expr(r"filter(split(lower(text), '\\W+'), w -> w <> '')").alias("ws"),
    ).filter(F.size("ws") > 0)
    chunk_hashes = F.expr(
        f"transform(sequence(0, cast(ceil(size(ws) / {CHUNK_WORDS}.0) as int) - 1), "
        f"i -> md5(concat_ws(' ', slice(ws, i * {CHUNK_WORDS} + 1, {CHUNK_WORDS}))))"
    )
    # aggregate barrier (same trick as _shingles_spark): store the hash
    # arrays before exploding so the split/transform chain is not
    # re-evaluated per exploded row
    hashed = (
        words.select("doc_id", chunk_hashes.alias("hs"))
        .groupBy("doc_id")
        .agg(F.first("hs").alias("hs"))
    )
    chunks = hashed.select("doc_id", F.explode("hs").alias("h"))
    dfreq = chunks.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    boiler = (F.col("n_docs") >= CHUNK_BOILER_DF).cast("int")
    return (
        chunks.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(boiler).cast("long").alias("n_boiler"),
            (F.sum(boiler).cast("double") / F.count(F.lit(1))).alias("boiler_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash estimator accuracy audit (round 3)
# ---------------------------------------------------------------------------

_EST_MATCH_DUCK = " + ".join(
    f"CAST(sa.mh{i} = sb.mh{i} AS BIGINT)" for i in range(N_MINHASH)
)


@register(
    "minhash_estimate_error",
    oracle=f"""
    WITH shingled AS ({_SHINGLES_SQL_DUCK}),
    hashed AS (
        SELECT doc_id, shingles,
               {_hash_array_exprs_duck()}
        FROM shingled
    ),
    sigs AS (
        SELECT doc_id, shingles,
               {_minhash_exprs_duck()}
        FROM hashed
    ),
    banded AS (
        SELECT doc_id,
               {_band_keys_duck()}
        FROM sigs
    ),
    band_long AS (
        SELECT doc_id, b.band, b.key
        FROM banded,
        LATERAL (VALUES (0, band0), (1, band1), (2, band2), (3, band3)) AS b(band, key)
    ),
    candidates AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band_long a JOIN band_long b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT c.id_a, c.id_b,
               CAST({_EST_MATCH_DUCK} AS BIGINT) AS est_matches,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS jac_num,
               CAST(len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS jac_den
        FROM candidates c
        JOIN sigs sa ON c.id_a = sa.doc_id
        JOIN sigs sb ON c.id_b = sb.doc_id
    )
    SELECT est_matches,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(jac_num * 1000 // jac_den) AS BIGINT) AS sum_jac_permille,
           CAST(MIN(jac_num * 1000 // jac_den) AS BIGINT) AS min_jac_permille,
           CAST(MAX(jac_num * 1000 // jac_den) AS BIGINT) AS max_jac_permille
    FROM pairs
    GROUP BY est_matches
    ORDER BY est_matches
    """,
    doc=f"Sketch self-audit: for every LSH candidate pair, the MinHash "
    f"Jaccard estimate (matching signature slots out of {N_MINHASH}) "
    "against the exact shingle Jaccard, rolled up per estimate bucket "
    "as exact integer permille stats. The calibration report that "
    "justifies trusting the sketch path at a scale where exact "
    "verification of every pair is unaffordable.",
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: identical dataflow to ``dedup_minhash_lsh`` (map-only
    signatures, ids-only band bucket join) plus one extra join pulling
    the 12 signature slots for candidate pairs — both probe sides are
    candidate-bounded, never corpus². The error stats are integer floor
    permille, so the audit itself is engine-exact. In production this
    runs on a sample partition each release to recalibrate the band/row
    choice against observed Jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    shingled = _shingles_spark(docs, materialize=False)
    hashed = shingled.select("doc_id", "shingles", *_hash_array_exprs_spark())
    sigs = hashed.select("doc_id", "shingles", *_minhash_exprs_spark())
    banded = sigs.select("doc_id", *_band_keys_spark())
    band_long = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("key"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = band_long.select(F.col("doc_id").alias("id_a"), "band", "key")
    b = band_long.select(F.col("doc_id").alias("id_b"), "band", "key")
    candidates = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    est = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("long") for i in range(N_MINHASH)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union = (F.size("sh_a") + F.size("sh_b")).cast("long") - inter
    pairs = (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            est.alias("est_matches"),
            inter.alias("jac_num"),
            union.alias("jac_den"),
        )
    )
    permille = F.expr("jac_num * 1000 div jac_den")
    return (
        pairs.groupBy("est_matches")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(permille).cast("long").alias("sum_jac_permille"),
            F.min(permille).cast("long").alias("min_jac_permille"),
            F.max(permille).cast("long").alias("max_jac_permille"),
        )
        .orderBy("est_matches")
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix — which crawls overlap which
# ---------------------------------------------------------------------------

from etl_loading_scripts_spark.registry import REGISTRY as _REGISTRY  # noqa: E402


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH pairs AS ({{minhash_oracle}}),
    src AS (SELECT doc_id, source FROM documents)
    SELECT LEAST(sa.source, sb.source) AS source_a,
           GREATEST(sa.source, sb.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
    FROM pairs p
    JOIN src sa ON p.id_a = sa.doc_id
    JOIN src sb ON p.id_b = sb.doc_id
    GROUP BY 1, 2
    """.format(minhash_oracle=_REGISTRY["dedup_minhash_lsh"].oracle),
    doc="Cross-source near-duplicate matrix: the MinHash-LSH verified "
    "pair graph attributed to (source, source) cells — which crawls "
    "mirror each other (off-diagonal mass) versus self-duplicate "
    "(diagonal). The mixture-design input that decides which source to "
    "DROP rather than dedup, and the first thing to read before "
    "trusting per-source token counts.",
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the registered pair graph verbatim (shingling cost is the
    pair graph's; the attribution is two dimension-sized joins + one
    bounded |sources|² aggregate). At 100 TB the pair graph is already
    the near-dedup byproduct — this matrix is a free report off it."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    src = docs.select("doc_id", "source")
    out = (
        pairs.join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )
    return out


# ---------------------------------------------------------------------------
# Threshold sensitivity curve — the dedup-calibration report
# ---------------------------------------------------------------------------

#: Jaccard thresholds (permille) swept by the sensitivity curve.
THRESHOLD_SWEEP_MILLE = (200, 300, 400, 500, 600, 700, 800)

_SWEEP_VALUES = ", ".join(f"({t})" for t in THRESHOLD_SWEEP_MILLE)


@register(
    "dedup_threshold_sensitivity",
    oracle=f"""
    WITH shingled AS ({{shingles}}),
    exploded AS (
        SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS n_sh
        FROM shingled
    ),
    hot AS (
        SELECT shingle FROM exploded
        GROUP BY shingle HAVING COUNT(*) > {{df_cap}}
    ),
    kept AS (
        SELECT * FROM exploded
        WHERE shingle NOT IN (SELECT shingle FROM hot)
    ),
    pair_counts AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared,
               ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b
        FROM kept a JOIN kept b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    thresholds(t_mille) AS (VALUES {_SWEEP_VALUES})
    SELECT t.t_mille AS threshold_permille,
           CAST(SUM(CASE WHEN 1000 * p.n_shared
                              >= t.t_mille * (p.n_a + p.n_b - p.n_shared)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN 1000 * p.n_shared
                              >= t.t_mille * (p.n_a + p.n_b - p.n_shared)
                         THEN p.id_b END) AS BIGINT) AS n_docs_dropped
    FROM pair_counts p CROSS JOIN thresholds t
    GROUP BY 1
    """.format(shingles=_SHINGLES_SQL_DUCK, df_cap=SHINGLE_DF_CAP),
    doc="Dedup threshold sensitivity: the candidate pair graph scored "
    "ONCE, then swept across seven Jaccard thresholds (integer "
    "cross-multiplied — 1000·shared ≥ t·union, no float compare): "
    "surviving pair count and docs-that-would-drop per threshold. The "
    "calibration curve read before committing a near-dedup threshold — "
    "a cliff between adjacent thresholds means the corpus has a "
    "boilerplate band there, a plateau means the choice is safe.",
)
def dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the expensive work (shingle, block, count shared) happens
    once — the sweep itself is a 7-row broadcast cross join over the
    bounded pair table, so the 7-point curve costs the same as one
    threshold. docs_dropped counts DISTINCT higher-id pair members: the
    keep-lowest-id dedup policy's casualty list at each setting."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = blocked_shingle_pair_counts(docs)
    thresholds = literal_table(
        spark, [(t,) for t in THRESHOLD_SWEEP_MILLE], "t_mille INT"
    )
    passing = F.lit(1000) * F.col("n_shared") >= F.col("t_mille") * (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return (
        pairs.crossJoin(broadcast_scalar(thresholds))
        .groupBy(F.col("t_mille").alias("threshold_permille"))
        .agg(
            F.sum(passing.cast("int")).cast("bigint").alias("n_pairs"),
            F.countDistinct(
                F.when(passing, F.col("id_b"))
            ).cast("bigint").alias("n_docs_dropped"),
        )
    )


@register(
    "shingle_df_distribution",
    oracle=f"""
    WITH shingled AS ({_SHINGLES_SQL_DUCK}),
    df AS (
        SELECT unnest(shingles) AS shingle, doc_id FROM shingled
    ),
    counts AS (
        SELECT shingle, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM df GROUP BY 1
    )
    SELECT CASE WHEN doc_freq = 1 THEN '1'
                WHEN doc_freq <= 5 THEN '2-5'
                WHEN doc_freq <= {SHINGLE_DF_CAP} THEN '6-cap'
                ELSE 'over-cap' END AS df_band,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(doc_freq) AS BIGINT) AS n_postings
    FROM counts GROUP BY 1
    """,
    doc="Shingle document-frequency histogram: how many distinct shingles "
    "fall in each DF band and how much posting-list mass they carry — "
    f"the index-health read that justifies SHINGLE_DF_CAP "
    f"({SHINGLE_DF_CAP}): the 'over-cap' band is boilerplate whose "
    "posting lists would dominate the inverted-index join cost while "
    "contributing no discriminative signal (every blocked-join dedup "
    "drops it, and this is the report that says how much was dropped).",
)
def shingle_df_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode + one distinct-count aggregate + a 4-band rollup; the
    n_postings column is the actual join-cost currency (candidate pairs
    scale with Σ df² per shingle — a single over-cap shingle with DF
    10⁶ alone would generate 10¹² candidate pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize: this query EXPLODES the shingle arrays, so without the
    # barrier the whole split->transform->distinct chain collapses into
    # the Generate and re-runs per exploded row (14.7s -> measured fix
    # in PROFILE r4)
    shingled = _shingles_spark(docs, materialize=True)
    counts = (
        shingled.select("doc_id", F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
    )
    band = (
        F.when(F.col("doc_freq") == 1, "1")
        .when(F.col("doc_freq") <= 5, "2-5")
        .when(F.col("doc_freq") <= SHINGLE_DF_CAP, "6-cap")
        .otherwise("over-cap")
    )
    return counts.groupBy(band.alias("df_band")).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("doc_freq").cast("bigint").alias("n_postings"),
    )


#: Pairs shown by the dedup explanation report.
EXPLAIN_TOP_PAIRS = 5


@register(
    "dedup_pair_explain",
    oracle=f"""
    WITH shingled AS ({_SHINGLES_SQL_DUCK}),
    exploded AS (
        SELECT doc_id, unnest(shingles) AS shingle, len(shingles) AS n_sh
        FROM shingled
    ),
    hot AS (
        SELECT shingle FROM exploded
        GROUP BY shingle HAVING COUNT(*) > {SHINGLE_DF_CAP}
    ),
    kept AS (
        SELECT * FROM exploded
        WHERE shingle NOT IN (SELECT shingle FROM hot)
    ),
    pair_counts AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared,
               ANY_VALUE(a.n_sh) AS n_a, ANY_VALUE(b.n_sh) AS n_b,
               MIN(a.shingle) AS example_shared_shingle
        FROM kept a JOIN kept b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    top_pairs AS (
        SELECT id_a, id_b, n_shared, n_a, n_b, example_shared_shingle,
               CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) AS jaccard
        FROM pair_counts
        ORDER BY CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) DESC,
                 id_a, id_b
        LIMIT {EXPLAIN_TOP_PAIRS}
    )
    SELECT id_a, id_b, n_shared, n_a, n_b, jaccard, example_shared_shingle
    FROM top_pairs
    """,
    doc=f"Dedup decision explanation: the {EXPLAIN_TOP_PAIRS} "
    "highest-Jaccard candidate pairs with their shared-shingle count, "
    "each side's shingle mass, and a concrete example shared shingle "
    "(deterministic: the lexicographic minimum) — the evidence a data "
    "steward reviews before signing off a merge, and the debugging "
    "view when a dedup threshold misfires. Auditability is part of the "
    "operator: a pipeline that deletes documents must be able to say "
    "why.",
)
def dedup_pair_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rides the same blocked pair computation as the Jaccard scorer
    with one extra MIN(shingle) aggregate — explanation costs nothing
    beyond what the dedup already computed. Top-k is
    TakeOrderedAndProject with unique (jaccard, id_a, id_b) ordering."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize: exploded is consumed THREE times (hot-shingle DF, both
    # join sides); the barrier makes the exchange reusable instead of
    # re-shingling the corpus per consumer (PROFILE r4: 14.7s -> ~3s)
    shingled = _shingles_spark(docs, materialize=True)
    exploded = shingled.select(
        "doc_id", F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    hot = (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("shingle")
    )
    kept = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    a = kept.select(
        F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle"
    )
    b = kept.select(
        F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.min("shingle").alias("example_shared_shingle"),
        )
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
    )
    return (
        pairs.orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(EXPLAIN_TOP_PAIRS)
        .select(
            "id_a", "id_b", "n_shared", "n_a", "n_b", "jaccard",
            "example_shared_shingle",
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization dedup — the FIRST dedup pass a web corpus runs
# ---------------------------------------------------------------------------


@register(
    "url_canonicalize_dedup",
    oracle="""
    WITH raw AS (
        SELECT doc_id, source,
               (CASE WHEN doc_id % 3 = 0 THEN 'http://' ELSE 'https://' END)
               || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.Site' ELSE 'site' END)
               || CAST(doc_id % 50 AS VARCHAR)
               || (CASE WHEN doc_id % 2 = 0 THEN '.COM' ELSE '.com' END)
               || '/page/' || CAST(doc_id % 200 AS VARCHAR)
               || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 4 = 0
                        THEN '?utm_source=feed&utm_campaign=x' ELSE '' END)
               || (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END)
                   AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, source,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           'https://' || regexp_replace(lower(
                               regexp_replace(url, '^https?://', '')
                           ), '^www\\.', ''),
                           '[?#].*$', ''),
                       '/$', ''),
                   '^$', '') AS curl
        FROM raw
    ),
    ranked AS (
        SELECT doc_id, source, curl,
               ROW_NUMBER() OVER (PARTITION BY curl ORDER BY doc_id) AS rn
        FROM canon
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM ranked GROUP BY 1
    """,
    doc="URL canonicalization dedup — the cheapest and FIRST dedup pass a "
    "web corpus runs, before any content hashing: scheme folding, host "
    "lowercasing, www-stripping, tracking-parameter (?utm_*) and "
    "fragment removal, trailing-slash trim — then keep-first per "
    "canonical URL (deterministic min doc_id). Messy variants are "
    "planted deterministically (the corpus has no URL column); "
    "per-source kept/dropped accounting.",
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: canonicalization is a map-side regexp chain fused into the
    scan; the only shuffle is the keep-first window on the canonical
    URL (high cardinality, no skew — the hot-key case is a canonical
    URL with millions of fetches, and ROW_NUMBER over it still spreads
    because the partition key IS the dedup key, the same shape as
    window_dedup_latest). In a real crawl this pass typically drops
    20-40% of fetches for free before any content byte is hashed."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, "http://").otherwise("https://"),
        F.when(F.col("doc_id") % 2 == 0, "WWW.Site").otherwise("site"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, ".COM").otherwise(".com"),
        F.lit("/page/"),
        (F.col("doc_id") % 200).cast("string"),
        F.when(F.col("doc_id") % 6 == 0, "/").otherwise(""),
        F.when(F.col("doc_id") % 4 == 0, "?utm_source=feed&utm_campaign=x").otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, "#section-2").otherwise(""),
    )
    curl = F.concat(
        F.lit("https://"),
        F.regexp_replace(
            F.lower(F.regexp_replace(url, r"^https?://", "")), r"^www\.", ""
        ),
    )
    curl = F.regexp_replace(curl, r"[?#].*$", "")
    curl = F.regexp_replace(curl, r"/$", "")
    canon = docs.select("doc_id", "source", curl.alias("curl"))
    w = Window.partitionBy("curl").orderBy("doc_id")
    ranked = canon.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("curl").cast("bigint").alias("n_canonical"),
        F.sum((F.col("rn") == 1).cast("int")).cast("bigint").alias("n_kept"),
        F.sum((F.col("rn") > 1).cast("int")).cast("bigint").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Span-level substring dedup — duplicated k-gram COVERAGE, not doc identity
# ---------------------------------------------------------------------------

#: Tokens per duplicated-substring gram. Production corpora use ~50-token
#: spans (the "deduplicating training data" line of work); the synthetic
#: docs are short, so the operator parameterizes at 8 — the PLAN is
#: identical at any k.
DUP_SPAN_K = 8


@register(
    "dup_span_coverage",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\W+'),
                           w -> w <> '') AS w
        FROM documents
    ),
    sized AS (SELECT doc_id, w, len(w) AS n FROM base WHERE len(w) > 0),
    grams AS (
        SELECT doc_id,
               unnest(range(0, n - {DUP_SPAN_K} + 1)) AS pos,
               unnest(list_transform(range(0, n - {DUP_SPAN_K} + 1),
                      i -> md5(array_to_string(w[i+1:i+{DUP_SPAN_K}], ' '))))
                   AS gram_key
        FROM sized
        WHERE n >= {DUP_SPAN_K}
    ),
    cnt AS (
        SELECT gram_key, COUNT(*) AS c FROM grams GROUP BY 1
    ),
    dup_pos AS (
        SELECT g.doc_id, g.pos
        FROM grams g JOIN cnt ON g.gram_key = cnt.gram_key
        WHERE cnt.c >= 2
    ),
    cov AS (
        SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dup_pos
    ),
    agg AS (
        SELECT doc_id,
               COUNT(*) AS n_dup_positions,
               SUM(CASE WHEN prev IS NULL THEN {DUP_SPAN_K}
                        ELSE LEAST({DUP_SPAN_K}, pos - prev) END) AS covered
        FROM cov GROUP BY 1
    )
    SELECT s.doc_id,
           CAST(s.n AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
           CAST(COALESCE(a.covered, 0) AS BIGINT) AS covered_tokens,
           CAST(COALESCE(a.covered, 0) AS DOUBLE) / s.n AS dup_fraction
    FROM sized s LEFT JOIN agg a ON s.doc_id = a.doc_id
    """,
    doc=f"SPAN-level substring dedup: the fraction of each document's "
    f"tokens covered by {DUP_SPAN_K}-gram substrings that occur at least "
    "twice in the corpus (interval-union coverage via the lag-window "
    "min(k, gap) identity) — the 'duplicated training spans' measure. "
    "Doc-level dedup (exact/MinHash/SimHash) keeps one copy of a "
    "boilerplate-heavy page; this finds the boilerplate INSIDE kept "
    "documents, the remove-or-downweight signal span-dedup pipelines act "
    "on. Exact integer coverage; md5 gram keys shared by both engines.",
)
def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one corpus-wide groupBy on the 32-char md5 gram key (the
    inverted index — ids+hash only through the exchange, never text), a
    semi-join of positions against duplicated keys on the same key (one
    shuffle, co-partitioned), and a doc-grain lag window. The k-gram
    explode is a bounded xK row multiplier of the token stream — the
    same cost every shingle operator here pays. At 50-token production
    spans the gram count per doc FALLS (n-k+1), not rises."""
    k = DUP_SPAN_K
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.expr(r"filter(split(lower(text), '\\W+'), w -> w <> '')").alias("w"),
    ).withColumn("n", F.size("w")).filter(F.col("n") > 0)
    grams = (
        sized.filter(F.col("n") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, n - {k}), i -> "
                    f"struct(i as pos, md5(concat_ws(' ', slice(w, i + 1, {k}))) as gram_key))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.pos", "g.gram_key")
    )
    dup_keys = grams.groupBy("gram_key").count().filter(F.col("count") >= 2)
    dup_pos = grams.join(dup_keys.select("gram_key"), "gram_key").select(
        "doc_id", "pos"
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    cov = dup_pos.withColumn("prev", F.lag("pos").over(w_doc))
    agg = cov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_positions"),
        F.sum(
            F.when(F.col("prev").isNull(), F.lit(k)).otherwise(
                F.least(F.lit(k), F.col("pos") - F.col("prev"))
            )
        ).alias("covered"),
    )
    return (
        sized.select("doc_id", "n")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_positions", F.lit(0)).cast("long").alias("n_dup_positions"),
            F.coalesce("covered", F.lit(0)).cast("long").alias("covered_tokens"),
            (
                F.coalesce("covered", F.lit(0)).cast("double") / F.col("n")
            ).alias("dup_fraction"),
        )
    )
