"""Small shared helpers for the expression library."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_col(col: Column | str) -> Column:
    """Resolve a name-or-Column, backtick-quoting names that contain a
    dot (``F.col("Price (excl. tax)")`` otherwise parses the dot as a
    struct-field access — the reference's column names include dots)."""
    if isinstance(col, Column):
        return col
    if "." in col and not col.startswith("`"):
        return F.col(f"`{col}`")
    return F.col(col)
