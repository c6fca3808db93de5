"""The T-SQL scalar family as Spark SQL UDFs (Spark 4.x SQL functions).

``functions/tsql.py`` gives the Python DataFrame API the reference's
scalar semantics; this module gives the SQL surface the same names, so a
user porting T-SQL scripts can keep writing SQL — ``SELECT
tsql_datekey(o_orderdate), tsql_norm_name(c_name) …`` — and every
function still lowers to a pure Catalyst expression (``CREATE FUNCTION …
RETURN <expr>`` is inlined at plan time: no Python, no JVM UDF object,
full codegen — unlike ``spark.udf.register`` which would drop the whole
expression out of codegen).

Parity is test-asserted: each SQL function must produce bit-identical
results to its ``tsql.py`` twin over the real tables
(tests/test_functions.py).

Reference provenance mirrors tsql.py: ISNULL/IIF ``S1:71-78``, name
normalization ``S1:7-14``, zero-pad ``S2:47``, datekey ``S2:17-18``,
EOMONTH ``S1:47``, md5 fingerprint standardization of HASHBYTES
``S1:7-14`` (SURVEY R2), ISDATE ``P-RES:91-94``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: name → (signature, return type, body expression). Bodies are pure SQL
#: expressions over the arguments — Catalyst inlines them like macros.
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "tsql_isnull": ("x STRING, d STRING", "STRING", "coalesce(x, d)"),
    "tsql_iif": (
        "c BOOLEAN, a STRING, b STRING",
        "STRING",
        "CASE WHEN c THEN a ELSE b END",
    ),
    "tsql_null_if_blank": ("x STRING", "STRING", "nullif(trim(x), '')"),
    "tsql_norm_name": ("x STRING", "STRING", "upper(coalesce(trim(x), ''))"),
    "tsql_concat2": (
        "a STRING, b STRING",
        "STRING",
        "concat(coalesce(a, ''), coalesce(b, ''))",
    ),
    "tsql_zero_pad4": (
        "n BIGINT",
        "STRING",
        "substring(concat('0000', cast(n AS STRING)), -4, 4)",
    ),
    "tsql_datekey": (
        "d DATE",
        "INT",
        "cast(date_format(d, 'yyyyMMdd') AS INT)",
    ),
    "tsql_eomonth": ("d DATE", "DATE", "last_day(d)"),
    "tsql_month_floor": ("d DATE", "DATE", "trunc(d, 'month')"),
    "tsql_isdate": ("x STRING", "BOOLEAN", "try_to_timestamp(x) IS NOT NULL"),
    "tsql_hashbytes": ("x STRING", "STRING", "md5(x)"),
    "tsql_money": ("x DOUBLE", "DECIMAL(18,4)", "cast(x AS DECIMAL(18,4))"),
}


def register_tsql_sql_functions(spark: SparkSession) -> list[str]:
    """Create the family as TEMPORARY SQL functions on this session.
    Idempotent (CREATE OR REPLACE). Returns the registered names."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
            f"RETURNS {ret} RETURN {body}"
        )
    return sorted(SQL_FUNCTIONS)


# ---------------------------------------------------------------------------
# The family exercised end-to-end from the SQL surface
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame  # noqa: E402

from etl_loading_scripts_spark.catalog import load_table  # noqa: E402
from etl_loading_scripts_spark.registry import register  # noqa: E402


@register(
    "sql_udf_fingerprint_rollup",
    oracle="""
    SELECT CAST(strftime(last_day(CAST(o.o_orderdate AS DATE)), '%Y%m%d') AS INT)
               AS month_end_key,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT md5(
               upper(trim(c.c_name)) || '|' ||
               substr('0000' || CAST(c.c_custkey % 10000 AS VARCHAR), -4)
           )) AS BIGINT) AS n_fingerprints
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    doc="The T-SQL scalar family driven from the SQL surface: a script-"
    "shaped query using tsql_datekey/tsql_eomonth/tsql_hashbytes/"
    "tsql_norm_name/tsql_zero_pad4 as SQL functions (Catalyst-inlined "
    "macros, zero UDF overhead) to roll up distinct customer "
    "fingerprints per month-end key — the reference's fingerprint-join "
    "idiom written exactly as its author would write it.",
)
def sql_udf_fingerprint_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A T-SQL author ports scripts, not DataFrame chains — this query is
    the existence proof that the scalar layer works from SQL text with
    the same bit-exact semantics (the oracle is plain DuckDB SQL with no
    knowledge of the functions). Plan note: because SQL functions are
    inlined at analysis time, the md5/upper/trim chain lands inside
    WholeStageCodegen exactly like the Python-API formulation — compare
    `new_fingerprint_insert`'s plan."""
    register_tsql_sql_functions(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT tsql_datekey(tsql_eomonth(CAST(o.o_orderdate AS DATE)))
                   AS month_end_key,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT tsql_hashbytes(concat(
                   tsql_norm_name(c.c_name), '|',
                   tsql_zero_pad4(c.c_custkey % 10000)
               ))) AS n_fingerprints
        FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """
    )
