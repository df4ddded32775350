"""Pure-Catalyst column expression library.

Every scalar transformation the reference performs with row-at-a-time
Python ``Series.apply`` (transformation_pipeline.py:45,48,54) is
re-expressed here as a native Catalyst column expression so it runs
inside whole-stage codegen, JVM-side, with no Python crossing. The one
exception (mojibake byte repair, P2) is an Arrow-batched pandas UDF.
"""

from books2scrape_etl_spark.functions.columns import (
    clean_currency,
    clean_description_suffix,
    clean_description_full,
    coalesce_default,
    extract_available_int,
    in_stock_flag,
    inventory_value,
    rating_ordinal,
    rewrite_relative_url,
    to_binary_flag,
)

__all__ = [
    "clean_currency",
    "clean_description_suffix",
    "clean_description_full",
    "coalesce_default",
    "extract_available_int",
    "in_stock_flag",
    "inventory_value",
    "rating_ordinal",
    "rewrite_relative_url",
    "to_binary_flag",
]
