"""Multi-statement SQL script execution — the stored-procedure surface.

The reference isn't a query library, it's SCRIPTS: sequences of
statements building staged results and publishing a final select
(``script.sql``, ``spScript.sql`` — SURVEY §1.1/§3). This module runs
that shape on Spark: a script is a ``;``-separated statement list,
executed in order against the session catalog, with the T-SQL scalar
family (``functions/sql_udfs.py``) pre-registered; the last statement's
result is the script's value.

Staged results are ``CREATE OR REPLACE TEMPORARY VIEW`` statements —
lazily-planned named stages that Catalyst inlines and optimizes ACROSS
statement boundaries (filter pushdown through three staged views works
exactly as if the script were one nested query). A T-SQL ``#temp`` table
that must materialize (reused N times, or breaking a pathological plan)
maps to ``CACHE TABLE``, which the runner passes through like any other
statement.

The splitter is quote- and comment-aware (semicolons inside string
literals and ``--`` comments don't split) — enough for the reference's
script corpus; it is NOT a full SQL parser and documents that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_loading_scripts_spark.functions.sql_udfs import (
    register_tsql_sql_functions,
)


def split_sql_statements(script: str) -> list[str]:
    """Split on top-level ``;`` — ignoring semicolons inside single- or
    double-quoted literals (with ``''`` escape) and ``--``/``/* */``
    comments. Returns non-empty statements, comments preserved."""
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    in_str: str | None = None
    in_line_comment = False
    in_block_comment = False
    while i < n:
        ch = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if in_line_comment:
            buf.append(ch)
            if ch == "\n":
                in_line_comment = False
        elif in_block_comment:
            buf.append(ch)
            if ch == "*" and nxt == "/":
                buf.append(nxt)
                i += 1
                in_block_comment = False
        elif in_str:
            buf.append(ch)
            if ch == in_str:
                if nxt == in_str:  # '' escape
                    buf.append(nxt)
                    i += 1
                else:
                    in_str = None
        elif ch == "-" and nxt == "-":
            buf.append(ch)
            in_line_comment = True
        elif ch == "/" and nxt == "*":
            buf.append(ch)
            in_block_comment = True
        elif ch in ("'", '"'):
            buf.append(ch)
            in_str = ch
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    stmt = "".join(buf).strip()
    if stmt:
        out.append(stmt)
    return out


def run_sql_script(spark: SparkSession, script: str) -> DataFrame | None:
    """Execute every statement in order; return the LAST statement's
    DataFrame (None for an all-DDL script). The tsql_* SQL functions are
    registered first, so ported reference scripts resolve their scalar
    calls. Each statement is planned eagerly (``spark.sql``) but staged
    views stay lazy — only actions in the final consumer execute jobs,
    so a 10-stage script still optimizes and runs as ONE Catalyst plan
    unless the script explicitly CACHEs a stage."""
    register_tsql_sql_functions(spark)
    result: DataFrame | None = None
    for stmt in split_sql_statements(script):
        result = spark.sql(stmt)
    return result


# ---------------------------------------------------------------------------
# A reference-shaped script under the oracle gate
# ---------------------------------------------------------------------------

from etl_loading_scripts_spark.catalog import register_views  # noqa: E402
from etl_loading_scripts_spark.registry import register  # noqa: E402

#: The miniature monthly-load script: stage typed facts, build the
#: normalized patron dimension with its 2-field fingerprint, publish the
#: per-nation rollup — the reference's stage→map→publish shape as literal
#: SQL text (S2 stages 1-5 in miniature; fingerprint idiom S1:7-25).
MINI_LOAD_SCRIPT = """
-- stage 1: typed order facts with integer datekey
CREATE OR REPLACE TEMPORARY VIEW stg_fact AS
SELECT o_orderkey AS txn_id,
       tsql_datekey(CAST(o_orderdate AS DATE)) AS datekey,
       o_custkey AS patron_nk,
       tsql_money(o_totalprice) AS amount
FROM orders;

-- stage 2: normalized patron dimension with identity fingerprint
CREATE OR REPLACE TEMPORARY VIEW dim_patron AS
SELECT c_custkey AS patron_nk,
       tsql_hashbytes(concat(tsql_norm_name(c_name), '|',
                             tsql_zero_pad4(c_custkey % 10000)))
           AS fingerprint,  -- the 'it''s a key' idiom; splitter-proof ;
       c_nationkey AS nation_key
FROM customer;

-- publish: per-nation rollup of mapped facts
SELECT n.n_name AS nation,
       COUNT(*) AS n_txns,
       COUNT(DISTINCT p.fingerprint) AS n_patrons,
       CAST(SUM(f.amount) AS DOUBLE) AS amount
FROM stg_fact f
JOIN dim_patron p ON f.patron_nk = p.patron_nk
JOIN nation n ON p.nation_key = n.n_nationkey
GROUP BY 1
"""


@register(
    "sql_script_mini_load",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           CAST(COUNT(DISTINCT md5(
               upper(trim(c.c_name)) || '|' ||
               substr('0000' || CAST(c.c_custkey % 10000 AS VARCHAR), -4)
           )) AS BIGINT) AS n_patrons,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS amount
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    doc="A three-statement SQL SCRIPT (stage facts → build fingerprinted "
    "dimension → publish per-nation rollup) executed by the script "
    "runner with the tsql_* functions in scope — the reference's "
    "stored-procedure shape running as literal SQL text; the oracle is "
    "independent flat SQL with no staging or functions.",
)
def sql_script_mini_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged views inline across statement boundaries, so this runs as
    ONE optimized plan — the script surface costs nothing over the
    DataFrame formulation (verify: same joins/aggregates as the
    equivalent chain, no extra exchanges). Scripts that rerun a stage N
    times add CACHE TABLE where T-SQL used #temp materialization."""
    register_views(spark, sf_dir)
    out = run_sql_script(spark, MINI_LOAD_SCRIPT)
    assert out is not None
    return out
