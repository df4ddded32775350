"""Aggregation helpers with order-independent floating-point semantics.

Distributed sums of doubles are not reproducible: partial-aggregate
order varies run to run and engine to engine, and at 60k+ rows the
accumulated error reaches the cents digit. The engine's money/measure
aggregates therefore cast each row to an exact DECIMAL before summing —
integer arithmetic, exact, order-independent, and bit-identical to a
DuckDB oracle computing ``SUM(CAST(x AS DECIMAL(18,s)))`` — then cast
the final value back to double for a stable output schema.

This costs one widening cast per row inside codegen (no Python, no
shuffle change) and buys deterministic results at any scale and any
partitioning — which is exactly what a 1000-executor run needs for
reproducible pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.util import to_col


def _c(col: Column | str) -> Column:
    return to_col(col)


def sum_exact(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a double column (exact at ``scale``)."""
    return F.sum(_c(col).cast(f"decimal({precision},{scale})")).cast("double")


def avg_exact(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as doubles."""
    c = _c(col)
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def oracle_sum_exact(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB SQL text matching :func:`sum_exact` bit-for-bit."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def oracle_avg_exact(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB SQL text matching :func:`avg_exact` bit-for-bit."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )
