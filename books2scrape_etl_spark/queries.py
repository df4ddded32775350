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
from books2scrape_etl_spark import query_defs3  # noqa: E402,F401
from books2scrape_etl_spark import query_defs4  # noqa: E402,F401
from books2scrape_etl_spark import query_defs5  # noqa: E402,F401

# ---------------------------------------------------------------------
# Registry ordering. The driver's CORRECTNESS harness checks at most the
# first ~50 entries, so order is load-bearing: WINDOW lists the 50
# qnames that together cover every SURVEY.md §2 component (suite qnames
# from query_defs3 stand in for groups of single-operator qnames); then
# every remaining oracle-paired qname (checked if the window is wider
# than 50); rows-only qnames go last — they yield only a weak rows>0
# signal and the real-stream ones are the slowest in the registry.
# ---------------------------------------------------------------------

WINDOW: tuple[str, ...] = (
    # headline + TPC-H shapes + LLM-pipeline north stars
    "flagship", "tpch_q3", "tpch_q5", "corpus_curation",
    "sim_cosine", "sim_ann_probe", "embed_norm", "text_stats", "lang_dist",
    "multimodal_bytes", "dedup_exact", "ngram_jaccard",
    # training-data pipeline (sampling / mixture / packing / fingerprint /
    # chunking / PII; sampling_suite = split + shards + stratified +
    # weighted; winnow_suite = fingerprint + candidates + decontam over
    # one shared fingerprint pass)
    "sampling_suite", "corpus_mixture", "pack_next_fit",
    "winnow_suite", "chunk_docs", "redact_pii",
    "repetition_stats", "vocab_topk",
    # joins / SQL surfaces
    "asof_join_general", "sql_api",
    "pivot_unpivot_suite", "subquery_suite",
    "grouping_sets", "agg_having",
    # MERGE / streaming join / sketch
    "scd2_upsert", "stream_join", "sketch_kmv",
    "scalar_funcs_suite", "date_funcs",
    # (partition_pruning moved just past the window: its real gate is the
    # dedicated PartitionFilters plan test in tests/test_plans.py)
    "udaf_grouped", "grouped_map",
    "surrogate_key_scale", "join_salted", "explode_split",
    # component suites (each packs 2-5 single-operator qnames)
    "columns_part_suite", "columns_lineitem_suite", "distinct_suite",
    "semi_anti_suite", "set_ops_suite", "window_suite", "topk_ordered",
    "json_map_ops",
    # consolidated component suites for sources / cleaning / streaming
    # (the standalone singles stay registered right after the window)
    "sources_suite", "clean_suite", "stream_windows_suite",
    # representative singles for the remaining components (agg_summary
    # moved just past the window: A1-A5 stay covered transitively by
    # flagship, which computes the same summary block)
    "join_fact", "join_sortmerge", "array_ops",
)


def _reorder() -> None:
    assert len(WINDOW) == 50, len(WINDOW)
    missing = [n for n in WINDOW if n not in QUERIES]
    assert not missing, f"WINDOW names not registered: {missing}"
    no_oracle = [n for n in WINDOW if n not in ORACLE_SQL]
    assert not no_oracle, f"WINDOW entries must be oracle-paired: {no_oracle}"
    rest_sql = [n for n in QUERIES if n not in set(WINDOW) and n in ORACLE_SQL]
    rest_rows_only = [n for n in QUERIES if n not in ORACLE_SQL]
    order = [*WINDOW, *rest_sql, *rest_rows_only]
    assert len(order) == len(QUERIES)
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
    sql_ordered = {n: ORACLE_SQL[n] for n in order if n in ORACLE_SQL}
    ORACLE_SQL.clear()
    ORACLE_SQL.update(sql_ordered)


_reorder()
