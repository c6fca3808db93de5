"""SemDeDup-style semantic deduplication (cluster, then dedup within).

The SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): k-means the
embedding space, then inside each cluster drop every vector whose cosine
to a *lower-id* kept vector exceeds a threshold — semantic near-dups land
in the same cluster, so the quadratic pair search is bounded per cluster
instead of corpus-wide. This is the production-scale complement to
``dedup_embedding_cosine`` (which blocks on a *given* label): here the
blocks are **learned** from the data by nearest-centroid assignment.

Exactness: centroid scores and pair cosines use the engine-wide integer
quantization (round(x*1e6)::bigint) — dots are exact int64, and the final
double divisions are IEEE-exactly-rounded in both engines, so argmax and
threshold decisions are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.llm.dedup import COSINE_DUP_THRESHOLD
from etl_loading_scripts_spark.llm.similarity import (
    _DOT_DUCK,
    _QVEC,
    _cosine_expr,
    _quantized,
)
from etl_loading_scripts_spark.registry import register

#: Number of deterministic centroids (vec_id < K) — stands in for a
#: converged k-means codebook; the assignment/dedup plan is identical.
K_CLUSTERS = 8


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, {_QVEC} AS qv FROM embeddings
    ),
    n AS (
        SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS norm2
        FROM q
    ),
    cent AS (
        SELECT vec_id AS cid, qv AS cqv, norm2 AS cn FROM n
        WHERE vec_id < {K_CLUSTERS}
    ),
    scored AS (
        SELECT v.vec_id, c.cid,
               CAST({_DOT_DUCK.format(a="v.qv", b="c.cqv")} AS DOUBLE)
                   / sqrt(CAST(c.cn AS DOUBLE)) AS score
        FROM n v CROSS JOIN cent c
    ),
    assign AS (
        SELECT vec_id, cid AS cluster_id
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY score DESC, cid
            ) AS rn
            FROM scored
        )
        WHERE rn = 1
    ),
    av AS (
        SELECT a.vec_id, a.cluster_id, n.qv, n.norm2
        FROM assign a JOIN n USING (vec_id)
    ),
    pairs AS (
        SELECT x.vec_id AS lo, y.vec_id AS hi
        FROM av x JOIN av y
          ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
        WHERE CAST({_DOT_DUCK.format(a="x.qv", b="y.qv")} AS DOUBLE)
                  / sqrt(CAST(x.norm2 AS DOUBLE))
                  / sqrt(CAST(y.norm2 AS DOUBLE))
              >= {COSINE_DUP_THRESHOLD}
    ),
    drops AS (
        SELECT hi AS vec_id, min(lo) AS dup_of FROM pairs GROUP BY 1
    )
    SELECT a.vec_id, a.cluster_id,
           CASE WHEN d.vec_id IS NULL THEN 'keep' ELSE 'drop' END AS action,
           d.dup_of
    FROM assign a LEFT JOIN drops d USING (vec_id)
    """,
    doc=f"SemDeDup: nearest-centroid assignment ({K_CLUSTERS} deterministic "
    "centroids) then within-cluster cosine dedup — every vector gets a "
    "keep/drop verdict with the lower-id duplicate it matched.",
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: assignment is corpus × broadcast(K centroids) — one map-side
    pass, the k-means plan. The pair search joins on the learned
    cluster_id, so candidate pairs are bounded per cluster (SemDeDup's
    whole point: |cluster|² ≪ N²); ids+vectors shuffle once on
    cluster_id. The drop rollup is a groupBy on vec_id. At 100 TB, K
    grows to ~sqrt(N) (as in the IVF index) to keep clusters small."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = _quantized(emb).localCheckpoint()
    cent = n.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"),
        F.col("qv").alias("cqv"),
        F.col("norm2").alias("cn"),
    )
    score = F.expr(
        "aggregate(zip_with(qv, cqv, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
    ).cast("double") / F.sqrt(F.col("cn").cast("double"))
    w = Window.partitionBy("vec_id").orderBy(F.col("score").desc(), "cid")
    assign = (
        n.crossJoin(F.broadcast(cent))
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cluster_id"), "qv", "norm2")
    )
    x = assign.select(
        "cluster_id",
        F.col("vec_id").alias("lo"),
        F.col("qv").alias("qa"),
        F.col("norm2").alias("na"),
    )
    y = assign.select(
        "cluster_id",
        F.col("vec_id").alias("hi"),
        F.col("qv").alias("qb"),
        F.col("norm2").alias("nb"),
    )
    pairs = (
        x.join(y, "cluster_id")
        .filter(F.col("lo") < F.col("hi"))
        .filter(_cosine_expr("qa", "qb", "na", "nb") >= COSINE_DUP_THRESHOLD)
        .select("lo", "hi")
    )
    drops = pairs.groupBy(F.col("hi").alias("vec_id")).agg(
        F.min("lo").alias("dup_of")
    )
    return assign.join(drops, "vec_id", "left").select(
        "vec_id",
        "cluster_id",
        F.when(F.col("dup_of").isNull(), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("action"),
        "dup_of",
    )
