"""PII redaction / scrubbing — a first-class pre-training-corpus
operator (strip emails, phone numbers, IPs, SSNs, card numbers before
the text reaches a training shard).

The reference pipeline has no PII stage (its corpus is a public
product catalog, extract_pipeline.py:10-94); this is part of the
LLM-data-pipeline extension mandate. Design rules:

- **Pure Catalyst**: a chain of ``regexp_replace`` calls — JVM-side,
  codegen'd, embarrassingly parallel, zero shuffle. No Python in the
  hot path; at 100 TB this runs at scan speed.
- **Engine-portable regexes**: the pattern set is restricted to the
  syntax subset Java regex and RE2 (DuckDB) evaluate identically —
  character classes, bounded repetition, alternation, ``\\b`` — no
  lookaround, no backreferences. That is what makes the DuckDB oracle
  an exact twin rather than an approximation.
- **Order is part of the contract**: patterns apply in a fixed order
  (email, card, SSN, phone, IPv4) so overlapping matches resolve the
  same way everywhere; ``PATTERNS`` is an ordered tuple, and the
  oracle SQL nests its replaces in the same order.

``redact_text`` returns the scrubbed column; ``pii_stats`` adds
per-category match counts (computed BEFORE redaction) for audit
dashboards / filtering rules (e.g. drop documents with > k hits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.util import to_col

# (name, pattern, replacement) — ordered; applied top to bottom. The
# card pattern precedes phone/SSN so a 16-digit grouped number is
# consumed whole; IPv4 goes last (its octets cannot be confused with
# the 3-3-4 phone shape, but last keeps the contract simple to reason
# about). All patterns are Java-regex/RE2-identical.
PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IPV4]"),
)


def redact_text(col: Column | str) -> Column:
    """Scrubbed text: every PATTERNS match replaced by its tag."""
    out = to_col(col)
    for _, pat, tag in PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category match counts on the ORIGINAL text (pre-redaction)."""
    c = to_col(col)
    return {name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))) for name, pat, _ in PATTERNS}


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df + ``<cat>_hits`` int columns + ``redacted`` text column."""
    counts = pii_counts(text_col)
    return df.select(
        "*",
        *[cnt.alias(f"{name}_hits") for name, cnt in counts.items()],
        redact_text(text_col).alias("redacted"),
    )


def oracle_redact_sql(expr: str) -> str:
    """DuckDB SQL computing :func:`redact_text` — same patterns, same
    order, global replace ('g': Spark's regexp_replace is always
    global, DuckDB's needs the flag)."""
    out = expr
    for _, pat, tag in PATTERNS:
        # DuckDB quoted strings are backslash-literal: pass the regex as-is.
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out


def oracle_count_sql(expr: str, name: str) -> str:
    """DuckDB SQL computing one :func:`pii_counts` column."""
    pat = next(p for n, p, _ in PATTERNS if n == name)
    return f"len(regexp_extract_all({expr}, '{pat}'))"
