"""Driver-facing query inventory (SURVEY.md §2 qnames).

Each entry: qname -> callable(spark, sf_dir) -> DataFrame, plus (where
SQL-expressible) a DuckDB oracle SQL string over the pre-registered
views ``region nation customer supplier part orders lineitem events
documents embeddings``. Column names are aliased identically on both
sides — the driver sorts columns by name before value-hashing.

Registration happens via the :func:`register` decorator so each
operator module can declare its own qnames next to the implementation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Import for registration side effects (each module registers its qnames).
from books2scrape_etl_spark import query_defs  # noqa: E402,F401
from books2scrape_etl_spark import query_defs2  # noqa: E402,F401
