"""Structural plan-boundedness proofs — broadcast safety by construction.

A ``BroadcastNestedLoopJoin`` is the one join strategy that can melt a
cluster: its cost is |left| x |build|, so it is legitimate ONLY when the
build side is bounded by CONSTRUCTION (a single-row global aggregate, a
literal lag table, a ``LIMIT k``), never merely by the data happening to
be small today. Round 4's defense was a per-query allow-list + runtime
row-count guards (``tests/test_plans.py``); VERDICT r5 item 4 called out
the list's growth (~50 entries) and asked for structural safety instead.

This module PROVES boundedness from the physical plan without executing
anything: a walk that accepts exactly the node shapes whose output
cardinality is statically known —

- global aggregates (``groupBy()`` with no keys → exactly one row),
- ``LocalTableScan`` of ≤ N literal rows (``VALUES`` lists),
- ``Range`` of ≤ N elements,
- ``LIMIT k`` with k ≤ N,
- cardinality-preserving wrappers (project/filter/sort/exchange/window),
- products/unions of bounded inputs (``Expand`` included — grouping
  sets multiply by a plan-constant factor),

and rejects everything else (file scans, grouped aggregates, RDD scans
— a filter on a corpus scan may be small at sf0.001 and 10^9 rows at
100 TB). Two consumers:

- :func:`broadcast_scalar` — the authoring API: wraps ``F.broadcast``
  but raises at query-construction time unless the build side is
  provably bounded, so a new query CANNOT accidentally broadcast a
  corpus; misuse fails the first unit test, not the cluster.
- ``tests/test_plans.py`` — the registry ratchet: any BNLJ whose build
  side proves bounded needs no allow-list entry; the list shrinks to
  the genuinely irregular cases (centroid tables from grouped
  aggregates, filter-derived query sets, calendar-grain spines), each
  still runtime-guarded.

Reference behavior modeled: none (engine safety layer; SURVEY §4's
broadcast discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Single-child physical nodes that never increase cardinality (or, for
#: Window/WindowGroupLimit, preserve it) — safe to look through.
_PASS_THROUGH = frozenset({
    "ProjectExec",
    "FilterExec",
    "SortExec",
    "BroadcastExchangeExec",
    "ShuffleExchangeExec",
    "CoalesceExec",
    "WholeStageCodegenExec",
    "InputAdapter",
    "ColumnarToRowExec",
    "RowToColumnarExec",
    "AQEShuffleReadExec",
    "WindowExec",
    "WindowGroupLimitExec",
    "GenerateExec__NEVER__",  # explode can blow up — listed here as a
    # reminder that it is deliberately NOT pass-through
})

_AGGREGATES = frozenset({
    "HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec"
})

_JOINS = frozenset({
    "BroadcastNestedLoopJoinExec",
    "BroadcastHashJoinExec",
    "SortMergeJoinExec",
    "ShuffledHashJoinExec",
    "CartesianProductExec",
})

#: Default cap, matching the runtime grain guard's bound in
#: tests/test_plans.py: far above every point grain the engine
#: broadcasts (single-row stats, 10-query sets, K<=16 centroids), far
#: below the smallest corpus table.
DEFAULT_MAX_ROWS = 64


def plan_is_bounded(node, max_rows: int = DEFAULT_MAX_ROWS) -> bool:
    """True iff the physical (sub)plan's output cardinality is provably
    ≤ ``max_rows`` (for the multiplicative shapes, each INPUT is bounded
    by ``max_rows`` — a product of two 64-row sides is accepted: still
    plan-constant, nowhere near corpus scale)."""
    cls = node.getClass().getSimpleName()
    if cls == "ReusedExchangeExec":
        return plan_is_bounded(node.child(), max_rows)
    if cls in _PASS_THROUGH:
        return plan_is_bounded(node.children().apply(0), max_rows)
    if cls in _AGGREGATES:
        # keys=[] → exactly one row; grouped → unbounded (key cardinality
        # is a data property, not a plan property)
        return bool(node.groupingExpressions().isEmpty())
    if cls in ("GlobalLimitExec", "CollectLimitExec"):
        # LocalLimitExec is deliberately NOT here: LocalLimit(k) caps
        # rows PER PARTITION, so a 1000-partition scan under
        # LocalLimit(64) can emit 64,000 rows — only the global forms
        # bound output cardinality.
        try:
            return int(node.limit()) <= max_rows
        except Exception:  # noqa: BLE001 — API drift → fail closed
            return False
    if cls == "LocalLimitExec":
        return False
    if cls == "LocalTableScanExec":
        try:
            return int(node.rows().size()) <= max_rows
        except Exception:  # noqa: BLE001
            return False
    if cls == "RangeExec":
        try:
            return int(str(node.numElements())) <= max_rows
        except Exception:  # noqa: BLE001
            return False
    if cls in _JOINS:
        ch = node.children()
        return plan_is_bounded(ch.apply(0), max_rows) and plan_is_bounded(
            ch.apply(1), max_rows
        )
    if cls in ("UnionExec", "ExpandExec"):
        ch = node.children()
        return all(
            plan_is_bounded(ch.apply(i), max_rows) for i in range(ch.size())
        )
    return False


def bnlj_builds_bounded(df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS) -> list[bool]:
    """For every BroadcastNestedLoopJoin in ``df``'s pre-adaptive
    physical plan, whether its BUILD side is provably bounded. Empty
    list = no BNLJ in the plan. Does not execute the query."""
    out: list[bool] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "BroadcastNestedLoopJoinExec":
            side = node.buildSide().toString()
            build = node.children().apply(1 if side == "BuildRight" else 0)
            out.append(plan_is_bounded(build, max_rows))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return out


def broadcast_scalar(df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS):
    """``F.broadcast`` that is safe BY CONSTRUCTION: raises at
    query-build time unless ``df``'s plan proves its cardinality
    ≤ ``max_rows``. Use for the single-row-stats / literal-sweep /
    LIMIT-k build sides of inequality joins; anything data-dependent
    (grouped aggregates, filtered scans) must go through the reviewed
    allow-list + runtime grain guard instead."""
    if not plan_is_bounded(df._jdf.queryExecution().sparkPlan(), max_rows):
        raise ValueError(
            f"broadcast_scalar: plan is not provably bounded to {max_rows} "
            "rows (file scan / grouped aggregate / RDD scan in the build "
            "side?) — use F.broadcast with a tests/test_plans.py allow-list "
            "entry and a runtime grain bound instead"
        )
    return F.broadcast(df)


def literal_table(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Build a small literal DataFrame through SQL ``VALUES`` so it
    plans as ``LocalTableScan`` — statically countable, hence accepted
    by :func:`plan_is_bounded` (``spark.createDataFrame`` plans as
    ``RDDScanExec``, which the proof must reject: an RDD's size is not
    a plan property). ``schema`` is the usual DDL string; values are
    CAST per column so VALUES' literal-type inference can't drift from
    the declared schema. Literals only — ints, floats, bools, None,
    and strings (quoted/escaped here); bytes/nested types are out of
    scope for a lag/sweep table."""
    if not rows:
        raise ValueError(
            "literal_table: empty rows — an empty VALUES list is not "
            "valid SQL, and an empty bounded-broadcast table is almost "
            "certainly a caller bug (filtered-away sweep?)"
        )
    fields = [f.strip().split(None, 1) for f in schema.split(",")]

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            # floats go as QUOTED strings through the declared-type CAST:
            # a bare -0.0 literal parses as DECIMAL zero (sign lost) before
            # the cast, while CAST('-0.0' AS DOUBLE) preserves IEEE -0.0;
            # the spellings below are the ones Spark's string-cast accepts
            import math

            if math.isnan(v):
                return "'NaN'"
            if math.isinf(v):
                return "'Infinity'" if v > 0 else "'-Infinity'"
            return f"'{v!r}'"
        if isinstance(v, int):
            return repr(v)
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        raise TypeError(f"literal_table: unsupported literal {type(v)}")

    values = ", ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in rows
    )
    cols = ", ".join(
        f"CAST(col{i + 1} AS {typ}) AS {name}"
        for i, (name, typ) in enumerate(fields)
    )
    return spark.sql(f"SELECT {cols} FROM VALUES {values}")
