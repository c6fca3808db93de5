"""T-SQL-semantics scalar helpers as pure Column builders.

Every function here returns a ``pyspark.sql.Column`` built from built-in
(JVM-side, codegen'd) functions — no Python UDFs — so expressions stay inside
whole-stage codegen and push down into parquet scans where possible.

Semantics shims for the reference workload (citations into
``/root/reference``, aliases per SURVEY.md):

- T-SQL ``CONCAT`` is NULL-safe (NULL → ``''``) while ``+`` propagates NULL —
  both appear in the reference (``PreparePOStoTxnMap_script.sql(S1):7`` vs
  ``UpdtMapDimPatron.sql(P-PAT):98``). Spark ``concat`` propagates NULL, so
  the two variants are exposed explicitly (SURVEY §7.4 R1).
- ``HASHBYTES('SHA1', …)`` fingerprints (``S1:54-69``) hash UTF-16LE and
  return VARBINARY; this engine standardizes on **md5 over UTF-8, lowercase
  hex** — self-consistent on both sides of every fingerprint join, and
  computable identically by the DuckDB oracle (SURVEY §7.4 R2; DuckDB ships
  md5 but not sha1).
- SQL Server's default collation compares case-insensitively; Spark is
  case-sensitive. Name-ish join keys are normalized upper+trim
  (SURVEY §7.4 R4) inside ``simhash_fingerprint`` / ``norm_name``.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def null_if_blank(c: ColumnOrName) -> Column:
    """``IIF(x = '', NULL, x)`` after trim — empty-string→NULL normalization.

    Reference: ``S1:71-78`` (IIF chains), ``S2:63`` (``NULLIF(x,'')``).
    """
    trimmed = F.trim(_col(c))
    return F.nullif(trimmed, F.lit(""))


def norm_name(c: ColumnOrName) -> Column:
    """Collation shim: UPPER(TRIM(x)) with NULL→'' — the normalization the
    reference applies to every name-ish join key (``S1:7-14``; SURVEY R4)."""
    return F.upper(F.coalesce(F.trim(_col(c)), F.lit("")))


def concat_nullsafe(*cols: ColumnOrName, sep: str = "") -> Column:
    """T-SQL ``CONCAT``: NULL behaves as ``''`` (``S1:7``)."""
    return F.concat_ws(sep, *[F.coalesce(_col(c), F.lit("")) for c in cols])


def concat_plus(*cols: ColumnOrName) -> Column:
    """T-SQL ``+`` string concat: NULL propagates (``P-PAT:98``)."""
    return F.concat(*[_col(c) for c in cols])


def zero_pad_last(c: ColumnOrName, n: int = 4, pad: str = "0") -> Column:
    """``RIGHT(CONCAT('0000', x), 4)`` — zero-pad then keep last n chars
    (``S2:47``, ``P-PAT:51``). NULL input → NULL (CONCAT of single NULL arg
    is '' in T-SQL; the reference always feeds non-NULL here, and NULL-in →
    NULL-out is the safer contract for a key builder)."""
    padded = F.concat(F.lit(pad * n), _col(c).cast("string"))
    return F.substring(padded, -n, n)


def clean_chain(c: ColumnOrName, replacements: Sequence[tuple[str, str]]) -> Column:
    """Nested-REPLACE normalization chain.

    The reference cleans billing-group / restaurant-group names with up to
    14 nested ``REPLACE`` calls (``BillingGroup_script.sql(S4):19-20,25-26``,
    ``UpdMapDimRest.sql(P-RES):225-229``). Expressed as a left fold of
    ``F.replace`` — one codegen'd expression, no UDF. Replacements apply in
    order, each over the previous result (exactly nested-REPLACE semantics).
    """
    out = _col(c)
    for old, new in replacements:
        out = F.replace(out, F.lit(old), F.lit(new))
    return out


#: The billing-group name scrub from ``S4:19-20`` re-expressed: strip quote
#: marks, slashes, termination suffixes, accents seen in the data, collapse
#: doubled spaces, trim. (The exact token list in the reference is data-
#: specific; this chain keeps the same *shape* — ordered nested REPLACE.)
BILLING_GROUP_CLEANUPS: tuple[tuple[str, str], ...] = (
    ('"', ""),
    ("'", ""),
    ("/", " "),
    ("\\", " "),
    ("-TERMINATED", ""),
    ("-TERMED", ""),
    ("-TERM", ""),
    ("É", "E"),
    ("È", "E"),
    ("Á", "A"),
    ("À", "A"),
    ("Ö", "O"),
    ("  ", " "),
    ("  ", " "),
)


def simhash_fingerprint(cols: Iterable[ColumnOrName], sep: str = "|") -> Column:
    """The reference's merchant fingerprint (its ``SimHash`` column).

    ``HASHBYTES('SHA1', CONCAT(UPPER(ISNULL(LTRIM(RTRIM(col)),'')), …))``
    over 8 normalized merchant-identity fields (``S1:7-14``), used as a
    computed equi-join key (``S1:18-25``) so fuzzy 8-field identity becomes
    a single shuffle-friendly key. Standardized here as md5-hex over a
    ``sep``-joined normalization (R2) — deterministic, engine-portable, and
    a plain expression Catalyst can join on.
    """
    return F.md5(F.concat_ws(sep, *[norm_name(c) for c in cols]))


def datekey(c: ColumnOrName) -> Column:
    """``CAST(FORMAT(d,'yyyyMMdd') AS int)`` — the fact table's integer date
    (``S2:17-18``, ``P-RES:460-464``)."""
    return F.date_format(_col(c), "yyyyMMdd").cast("int")


def datekey_to_date(c: ColumnOrName) -> Column:
    """Inverse of :func:`datekey`."""
    return F.to_date(_col(c).cast("string"), "yyyyMMdd")


def month_floor(c: ColumnOrName) -> Column:
    """``FORMAT(d,'yyyy-MM-01')`` month start (``S1:46``)."""
    return F.trunc(_col(c), "month")


def eomonth(c: ColumnOrName, months_offset: int = 0) -> Column:
    """``EOMONTH(d[, offset])`` (``S1:47``, ``PS:74-75``)."""
    base = F.add_months(_col(c), months_offset) if months_offset else _col(c)
    return F.last_day(base)


def month_window(c: ColumnOrName, months_back: int = 1) -> tuple[Column, Column]:
    """(first_day, last_day) of the month ``months_back`` before ``c`` —
    the reference's previous-calendar-month batch window (``S1:46-47``,
    ``S2:14-18``). The anchor date is always an explicit column/literal,
    never ``now()`` inside a transform (SURVEY §7.4 R9)."""
    anchor = F.add_months(_col(c), -months_back)
    return F.trunc(anchor, "month"), F.last_day(anchor)


def is_date(c: ColumnOrName) -> Column:
    """``ISDATE(x)`` ≈ try-parse success (``P-RES:91-94``). Spark's
    ``try_to_timestamp`` returns NULL on failure — exactly TRY semantics."""
    return F.try_to_timestamp(_col(c)).isNotNull()
