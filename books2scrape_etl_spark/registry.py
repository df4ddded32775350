"""Qname registry: the QUERIES / ORACLE_SQL dicts and the register
decorator, in a leaf module with no intra-package imports.

Why a separate module: query_defs* modules register themselves at
import time, and tests import those modules directly. When the dicts
lived in queries.py, a direct `import query_defsN` triggered the
circular chain test -> defsN (partial) -> queries -> defs1..33 ->
window reorder, which ran while defsN was still half-initialized and
died on the WINDOW assert. With the dicts here, defs modules import
only this leaf; queries.py (driver entry path) remains the single
place that imports every defs module and fixes the registry order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        # A duplicate would silently shadow the earlier implementation
        # (import order wins) while every count/coverage ledger still
        # reads as if both existed — caught once in the wild
        # (cohort_retention, weekly defs9 vs monthly defs19).
        if name in QUERIES:
            raise ValueError(f"duplicate qname registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
