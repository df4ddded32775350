"""qname definitions — every driver-checkable query from SURVEY.md §2.

Each function composes operators from the library; the paired DuckDB
oracle SQL expresses identical semantics. Grouped by SURVEY section.
"""

from __future__ import annotations

from books2scrape_etl_spark.plans.flagship import FLAGSHIP_ORACLE, flagship
from books2scrape_etl_spark.queries import register

register("flagship", FLAGSHIP_ORACLE)(flagship)
