"""Join rewrites the optimizer won't do for us (SURVEY §4.3, §7.4 R5)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def or_join(
    left: DataFrame,
    right: DataFrame,
    key_pairs: Sequence[tuple[Column, Column]],
    how: str = "inner",
) -> DataFrame:
    """Disjunctive-condition join as a union of equi-joins (O28).

    The reference joins restaurant groups on a 4-way OR of name variants
    (``UpdMapDimRest.sql(P-RES):448-451``). A literal OR join condition has
    no equi keys, so Spark (like SQL Server) degenerates to a nested-loop /
    cartesian plan — catastrophic at scale. Rewrite: one shuffle-friendly
    equi-join per disjunct on a derived key column, union, dedup on the
    left's row identity. Each branch gets broadcast/sort-merge + AQE
    individually.

    ``key_pairs``: one ``(left_expr, right_expr)`` per disjunct. Only
    ``inner`` and ``left_semi``-style usage make sense here; dedup keeps the
    first disjunct's match when several fire (matching T-SQL UPDATE's
    first-match-wins, made deterministic by branch priority).

    Row identity for the dedup is a per-row tag assigned BEFORE branching
    (ADVICE r1): duplicate left rows each keep their own first match (the
    T-SQL per-row cardinality), and the dedup window shuffles one long,
    not the full left row payload. The tag is ``monotonically_increasing_id``
    over the left plan — deterministic across the branches because they
    share the same (deterministic) scan lineage; it never leaves this
    function.
    """
    tagged = left.withColumn("__lid__", F.monotonically_increasing_id())
    branches = []
    for i, (lk, rk) in enumerate(key_pairs):
        l_keyed = tagged.withColumn("__k__", lk)
        r_keyed = right.withColumn("__k__", rk)
        b = l_keyed.join(r_keyed, on="__k__", how=how).drop("__k__")
        branches.append(b.withColumn("__branch__", F.lit(i)))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    # first-firing disjunct wins per left row
    w = Window.partitionBy("__lid__").orderBy("__branch__")
    return (
        out.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "__branch__", "__lid__")
    )


def anti_not_in(
    left: DataFrame,
    right_keys: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """``x NOT IN (SELECT k FROM …)`` with T-SQL's NULL trap handled (O21).

    T-SQL/ANSI NOT IN yields **no rows at all** if the subquery contains a
    NULL (``UpdtMapDimPatron.sql(P-PAT):40`` relies on the data having
    none). A left-anti join treats NULLs sanely; this wrapper documents and
    enforces the ANSI edge: NULL subquery values are dropped before the
    anti-join, so semantics match NOT IN whenever the subquery is NULL-free
    and are the *useful* semantics when it is not (SURVEY §7.4 R5).
    """
    keys = right_keys.select(F.col(right_key).alias(left_key)).filter(
        F.col(left_key).isNotNull()
    )
    return left.join(keys, on=left_key, how="left_anti")


def top1_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    rank_fn=F.row_number,
) -> DataFrame:
    """``ROW_NUMBER()/RANK() OVER (PARTITION BY … ORDER BY …) = 1`` —
    the reference's dedup-before-merge discipline (O41/O43; ``S4:23,30``,
    ``P-RES:30-47,65-66``). One shuffle on the partition keys."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rk__", rank_fn().over(w))
        .filter(F.col("__rk__") == 1)
        .drop("__rk__")
    )


def top1_per_group_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: str | Column,
) -> DataFrame:
    """Same result as ``top1_per_group(df, keys, [asc order_col])`` when
    ``order_col`` is UNIQUE within each group (a tie picks an arbitrary
    winner, where row_number picks a deterministic-but-arbitrary one —
    callers with unique order keys, like txn_id, lose nothing), but
    expressed as ``min_by`` AGGREGATION instead of a window. NULL order
    keys rank FIRST, matching Spark's default ascending sort (the
    window variant's behavior): the ranking value is a
    ``(isNotNull, key)`` struct, so bare ``min_by`` — which silently
    SKIPS null ordering values and would return all-null rows for an
    all-null group — never sees a null ranking.

    Why aggregation: the window sorts every row after its exchange;
    the aggregate replaces that sort with hash aggregation (and gets
    map-side partial aggregation when duplicates co-locate). Measured
    on the monthly load at 100×: s2 wall 40.1 → 35.0 s, SCALING.md r9
    (the shuffle itself didn't shrink there — scattered duplicates —
    the win is the removed sort). The window variant stays for rank
    semantics (ties, multi-column orderings, RANK)."""
    def _q(name: str) -> "F.Column":
        # backtick-quote: a column NAME containing a dot must resolve
        # as the literal column, not a nested path
        return F.col(f"`{name}`" if "." in name else name)

    partition_by = list(partition_by)
    value_cols = [c for c in df.columns if c not in partition_by]
    oc = _q(order_col) if isinstance(order_col, str) else order_col
    ranking = F.struct(
        oc.isNotNull().alias("__nn"), oc.alias("__o")
    )
    packed = df.groupBy(*[_q(c) for c in partition_by]).agg(
        F.min_by(F.struct(*[_q(c).alias(c) for c in value_cols]), ranking)
        .alias("__top__")
    )
    top = F.col("__top__")
    out = packed.select(
        *[_q(c) for c in partition_by],
        # getField (not "__top__.{c}") for the same dotted-name reason
        *[top.getField(c).alias(c) for c in value_cols],
    )
    return out.select(*[_q(c) for c in df.columns])
