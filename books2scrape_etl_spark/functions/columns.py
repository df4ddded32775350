"""Scalar column expressions (SURVEY.md §2.2, P1-P11).

Each function returns a Column expression — composable, codegen-friendly,
and usable in any plan. Reference citations point at the pandas/Python
code whose semantics each expression reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.util import to_col

RATING_WORDS = {"One": 1, "Two": 2, "Three": 3, "Four": 4, "Five": 5}


def clean_currency(col: Column | str) -> Column:
    """P1 — dirty currency text -> double.

    Reference: transformation_pipeline.py:5-11 (regex ``[^\\d.]`` strip +
    ``float()``), applied at :43-45 to 'Â£51.77'-style values. Pure
    Catalyst: regexp_replace + try_cast; unparseable text (e.g. empty
    after stripping) becomes null — the reference's ValueError -> None
    path, and ANSI-mode-safe (Spark 4 ``cast`` throws on '').
    """
    c = to_col(col)
    return F.regexp_replace(c.cast("string"), r"[^0-9.]", "").try_cast("double")


def clean_description_suffix(col: Column | str) -> Column:
    """P2 (Catalyst half) — null -> '' and strip a trailing ' ...more'.

    Reference: transformation_pipeline.py:14-21. The cp1252 mojibake
    repair half (:22-23) is byte-level and lives in
    :func:`mojibake_fix_udf` — only that part needs Python.
    """
    c = to_col(col)
    no_null = F.coalesce(c, F.lit(""))
    return F.regexp_replace(no_null, r" \.\.\.more$", "")


def _mojibake_fix(s):
    # cp1252 encode-ignore / utf-8 decode-ignore round trip —
    # byte-exact parity with transformation_pipeline.py:22-23.
    def fix(x):
        if x is None:
            return ""
        return x.encode("cp1252", errors="ignore").decode("utf-8", errors="ignore")

    return s.map(fix)


def clean_description_full(col: Column | str) -> Column:
    """P2 (full) — suffix strip + mojibake repair.

    The encode/decode round trip (transformation_pipeline.py:22-23) is
    lossy and byte-order-sensitive; no Catalyst expression reproduces it,
    so this is the engine's one irreducible scalar UDF — Arrow-batched
    (pandas_udf), never row-at-a-time.
    """
    fixer = F.pandas_udf(_mojibake_fix, "string")
    return fixer(clean_description_suffix(col))


def inventory_value(price: Column | str, stock: Column | str) -> Column:
    """P3 — arithmetic derived column.

    Reference: ``Inventory Value = Price(excl) * No_in_Stock``
    (transformation_pipeline.py:51).
    """
    p = to_col(price)
    s = to_col(stock)
    return p * s


def to_binary_flag(col: Column | str) -> Column:
    """P4 — boolean -> 0/1 int recode (CASE WHEN).

    Reference: ``1 if x == True else 0`` (transformation_pipeline.py:54).
    Note the reference maps null -> 0 too (``None == True`` is False).
    """
    c = to_col(col)
    return F.when(c == F.lit(True), 1).otherwise(0)


def rating_ordinal(col: Column | str) -> Column:
    """P7 — rating word -> ordinal, unmapped -> 0.

    Reference: ``{"One":1,...,"Five":5}.get(x, 0)``
    (extract_pipeline.py:92-94). Chained CASE keeps it codegen'd; a 5-row
    broadcast mapping table would also work but is overkill.
    """
    c = to_col(col)
    expr = F.lit(0)
    # build CASE word-by-word; when() chains left-to-right
    out = None
    for word, num in RATING_WORDS.items():
        out = F.when(c == word, num) if out is None else out.when(c == word, num)
    return out.otherwise(expr)


def rewrite_relative_url(col: Column | str, prefix: str) -> Column:
    """P8 — URL string rewrite: strip '../' then prepend a site prefix.

    Reference: extract_pipeline.py:13,69.
    """
    c = to_col(col)
    return F.concat(F.lit(prefix), F.replace(c, F.lit("../"), F.lit("")))


def in_stock_flag(col: Column | str) -> Column:
    """P9 — substring-based boolean: 'In stock' before the first '('.

    Reference: ``"In stock" in text.split('(')[0]``
    (extract_pipeline.py:29,32).
    """
    c = to_col(col)
    return F.contains(F.split_part(c, F.lit("("), F.lit(1)), F.lit("In stock"))


def extract_available_int(col: Column | str) -> Column:
    """P10 — parse the int out of '... (N available)'.

    Reference: extract_pipeline.py:30,33. regexp_extract returns '' on
    no-match, which try_casts to null — the sane distributed analogue of
    the reference's unguarded IndexError (plain cast throws under ANSI).
    """
    c = to_col(col)
    return F.regexp_extract(c, r"\((\d+) available\)", 1).try_cast("int")


def coalesce_default(col: Column | str, default: str = "No description available") -> Column:
    """P11 — null-default scalar (extract_pipeline.py:10-11)."""
    c = to_col(col)
    return F.coalesce(c, F.lit(default))
