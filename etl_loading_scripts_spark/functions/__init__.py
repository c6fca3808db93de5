"""Scalar function layer with T-SQL-compatible semantics (SURVEY §2.8)."""

from etl_loading_scripts_spark.functions.tsql import (
    clean_chain,
    concat_nullsafe,
    concat_plus,
    datekey,
    datekey_to_date,
    eomonth,
    is_date,
    month_floor,
    month_window,
    null_if_blank,
    simhash_fingerprint,
    zero_pad_last,
)

__all__ = [
    "clean_chain",
    "concat_nullsafe",
    "concat_plus",
    "datekey",
    "datekey_to_date",
    "eomonth",
    "is_date",
    "month_floor",
    "month_window",
    "null_if_blank",
    "simhash_fingerprint",
    "zero_pad_last",
]
