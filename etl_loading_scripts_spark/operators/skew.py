"""Skew mitigation: salted joins (SURVEY §4 — 'merchant-name hot keys').

AQE's skew-join handles most runtime skew (enabled in the session factory);
explicit salting remains the tool when one key dominates so heavily that
even split partitions overwhelm a task — the reference's ``'MC'`` client
rows (S1:97) are exactly that shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: spread each key over
    ``n_salt`` sub-partitions, replicate the other side n_salt ways, join on
    (key, salt).

    The salt is derived from ``xxhash64`` of the full row (deterministic for
    a given row, uniform across duplicates of the hot key) — never
    ``rand()``, which breaks retry determinism. Result equality with the
    plain join is unit-tested.

    Cost model: replicates ``small`` n_salt× — use when |small| ≪ the hot
    partition, which is precisely the skew scenario. For skewed-BOTH-sides
    joins, salt only the hot key list (two-pass: split hot keys out, plain
    join the rest).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salt))
    left = skewed.withColumn("__salt__", salt)
    right = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt__", F.col("__salt__").cast("long"))
    out = left.join(right, [key, "__salt__"], how)
    return out.drop("__salt__")
