"""Entity resolution end-to-end: normalize → block → score → cluster →
survive.

The reference's whole patron/restaurant mapping problem (SURVEY §1.3,
``P-PAT``/``P-RES``) is entity resolution: the same real-world entity
arrives under varying names and must land on one surrogate. The engine
carries each stage as a separate operator (norm_name, fingerprint join,
fuzzy prefix/levenshtein joins, connected components, keep-best
survivorship); this module composes them into the one pipeline a
deduplication user actually runs, with PLANTED variants so the expected
resolution is derivable independently:

- every 7th customer gains a typo'd duplicate (one deleted letter —
  edit distance 1, must merge);
- every 13th customer gains a renamed record (different brand token —
  edit distance > threshold, must NOT merge, even though blocking
  pairs it).

A resolver that over-merges, under-merges, or lets blocking decide
matches (instead of recall-only candidate generation) diverges from the
oracle per nation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.functions.tsql import norm_name
from etl_loading_scripts_spark.registry import register

#: Planted-variant knobs: id offset keeps variants disjoint from real
#: keys; the mods choose which customers gain which variant.
ER_OFFSET = 10_000_000
ER_TYPO_MOD = 7
ER_RENAME_MOD = 13

#: Edit-distance acceptance threshold for a candidate pair.
ER_MAX_DISTANCE = 2


@register(
    "entity_resolution_e2e",
    oracle=f"""
    WITH typo AS (
        SELECT c_custkey + {ER_OFFSET} AS rid, c_custkey AS orig,
               replace(c_name, 'Customer#', 'Custmer#') AS name, c_nationkey
        FROM customer WHERE c_custkey % {ER_TYPO_MOD} = 0
    ),
    renamed AS (
        SELECT c_custkey + 2 * {ER_OFFSET} AS rid, c_custkey AS orig,
               replace(c_name, 'Customer#', 'Client#') AS name, c_nationkey
        FROM customer WHERE c_custkey % {ER_RENAME_MOD} = 0
    ),
    verdict AS (
        SELECT orig, c_nationkey,
               levenshtein(upper(trim(name)),
                           upper(trim('Customer#' || substr(name, position('#' IN name) + 1)))
               ) <= {ER_MAX_DISTANCE} AS merged
        FROM (SELECT * FROM typo UNION ALL SELECT * FROM renamed)
    )
    SELECT c.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN v.merged THEN 1 ELSE 0 END) AS BIGINT)
               AS n_merged_pairs,
           CAST(COUNT(*) - SUM(CASE WHEN v.merged THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unmerged_variants
    FROM verdict v JOIN customer c ON v.orig = c.c_custkey
    GROUP BY 1
    """,
    doc="Entity resolution over planted variants: every 7th customer "
    "gains an edit-distance-1 typo record (must merge), every 13th a "
    "rebranded record past the distance threshold (must stay separate "
    "despite sharing its blocking key). Pipeline: normalize → block on "
    "(nation, numeric suffix) → Levenshtein accept ≤ "
    f"{ER_MAX_DISTANCE} → min-label cluster → count survivors per "
    "nation. Oracle derives the verdict per planted variant directly "
    "from the edit distance, with no blocking and no clustering — an "
    "independent formulation of the same ground truth.",
)
def entity_resolution_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: blocking bounds candidates (each block is one entity's
    records, never the corpus cross product) exactly like the
    fingerprint equi-join idiom (S1:18-25) — the Levenshtein kernel only
    ever runs inside blocks. Clustering is the min-label fold over pair
    edges (order-independent); survivorship keeps the minimum record id
    per cluster. All stages are the registered standalone operators
    composed, so a regression in any of them surfaces here too."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    typo = cust.filter(F.col("c_custkey") % ER_TYPO_MOD == 0).select(
        (F.col("c_custkey") + ER_OFFSET).alias("rid"),
        F.replace(
            F.col("c_name"), F.lit("Customer#"), F.lit("Custmer#")
        ).alias("name"),
        "c_nationkey",
    )
    renamed = cust.filter(F.col("c_custkey") % ER_RENAME_MOD == 0).select(
        (F.col("c_custkey") + 2 * ER_OFFSET).alias("rid"),
        F.replace(
            F.col("c_name"), F.lit("Customer#"), F.lit("Client#")
        ).alias("name"),
        "c_nationkey",
    )
    records = (
        cust.select(
            F.col("c_custkey").alias("rid"),
            F.col("c_name").alias("name"),
            "c_nationkey",
        )
        .unionByName(typo)
        .unionByName(renamed)
    )

    # normalize + block: (nation, numeric suffix) — recall-oriented, the
    # rename variant lands in the SAME block and must be rejected by score
    normed = records.select(
        "rid",
        "c_nationkey",
        norm_name("name").alias("norm"),
        F.regexp_extract("name", r"(\d+)", 1).alias("block_digits"),
    )
    a = normed.select(
        F.col("rid").alias("id_a"),
        F.col("norm").alias("norm_a"),
        "c_nationkey",
        "block_digits",
    )
    b = normed.select(
        F.col("rid").alias("id_b"),
        F.col("norm").alias("norm_b"),
        "c_nationkey",
        "block_digits",
    )
    pairs = (
        a.join(b, ["c_nationkey", "block_digits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("norm_a", "norm_b") <= ER_MAX_DISTANCE)
        .select("id_a", "id_b")
    )

    # min-label clustering (planted clusters have diameter 1; one round
    # of min-neighbor assignment reaches the fixpoint)
    min_label = pairs.groupBy(F.col("id_b").alias("rid")).agg(
        F.min("id_a").alias("cluster")
    )
    resolved = normed.join(min_label, "rid", "left").select(
        "rid",
        "c_nationkey",
        F.coalesce("cluster", "rid").alias("cluster"),
    )

    variants = resolved.filter(F.col("rid") >= ER_OFFSET)
    return variants.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum((F.col("cluster") < ER_OFFSET).cast("int"))
        .cast("bigint")
        .alias("n_merged_pairs"),
        F.sum((F.col("cluster") >= ER_OFFSET).cast("int"))
        .cast("bigint")
        .alias("n_unmerged_variants"),
    )
