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
from books2scrape_etl_spark import query_defs6  # noqa: E402,F401
from books2scrape_etl_spark import query_defs7  # noqa: E402,F401
from books2scrape_etl_spark import query_defs8  # noqa: E402,F401
from books2scrape_etl_spark import query_defs9  # noqa: E402,F401

# ---------------------------------------------------------------------
# Registry ordering. The driver's CORRECTNESS harness checks at most the
# first ~50 entries, so order is load-bearing: WINDOW lists the 50
# qnames that together cover every SURVEY.md §2 component (suite qnames
# from query_defs3 stand in for groups of single-operator qnames); then
# every remaining oracle-paired qname (checked if the window is wider
# than 50); rows-only qnames go last — they yield only a weak rows>0
# signal and the real-stream ones are the slowest in the registry.
# ---------------------------------------------------------------------

# Round-5 rotation (VERDICT r4 item 1): the 22 oracle-paired qnames that
# had never occupied a driver slot rotate IN; 22 multi-round-green entries
# (each with >=2 hard driver rows across r1/r2/r4: tpch_q3/q5,
# corpus_curation, sim_cosine, embed_norm, text_stats, lang_dist,
# multimodal_bytes, dedup_exact, ngram_jaccard, corpus_mixture,
# pack_next_fit, repetition_stats, vocab_topk, asof_join_general, sql_api,
# pivot_unpivot_suite, subquery_suite, grouping_sets, agg_having,
# scalar_funcs_suite, date_funcs, ...) rotate OUT to the just-past-window
# oracle-paired block. Rotate them back in round 6 — TOGETHER WITH the
# 20 late-round-5 wave-9 qnames (sketch_cms, heavy_hitters, lm_quality,
# token_budget, embed_quantize, funnel_steps, cohort_retention,
# scan_jsonl, scan_orc, scan_merge_schema, avi_frames, join_bloom,
# window_range_time, variant_ops, recursive_cte, sketch_kmv_setops,
# dq_audit, fuzzy_join, outlier_zscore, compact_files), which are
# oracle-paired and driver-sim-green at both sf0.01 and sf0.1 but sit
# past the window this round.
#
# CONCRETE r6 WINDOW PROPOSAL (drawn up end of r5; 20 + 25 + 5 = 50):
#   20 wave-9 (never driver-checked): the list above;
#   25 returners (multi-round green, rotated out for r5): tpch_q3,
#     tpch_q5, corpus_curation, sim_cosine, embed_norm, text_stats,
#     lang_dist, multimodal_bytes, dedup_exact, ngram_jaccard,
#     corpus_mixture, pack_next_fit, repetition_stats, vocab_topk,
#     asof_join_general, sql_api, pivot_unpivot_suite, subquery_suite,
#     grouping_sets, agg_having, scalar_funcs_suite, date_funcs,
#     columns_part_suite, distinct_suite, set_ops_suite;
#   5 holdovers (keep continuous coverage of the flagship + the widest
#     suites): flagship, books_e2e, stream_windows_suite, winnow_suite,
#     sampling_suite.
# Everything else rotated out will then hold >=1 green row from r5;
# rotate the single-green r5 window rows back in r7.
WINDOW: tuple[str, ...] = (
    # headline + TPC-H shapes + the end-to-end reference DAG
    "flagship", "tpch_q10", "tpch_q12", "tpch_q14", "tpch_q18",
    "books_e2e", "corpus_build",
    # training-data pipeline (sampling / fingerprint / chunking / PII;
    # sampling_suite = split + shards + stratified + weighted;
    # winnow_suite = fingerprint + candidates + decontam)
    "sim_ann_probe", "sampling_suite", "winnow_suite",
    "chunk_docs", "redact_pii",
    "weighted_sample", "stratified_sample", "stratified_threshold",
    "shuffle_shards", "decontaminate",
    # SQL-surface singles (their wrapping suites are multi-green; the
    # singles now earn their own driver rows)
    "pivot", "unpivot", "scalar_subquery", "correlated_subquery",
    "in_subquery",
    # joins / windows / scalar-function singles
    "join_asof", "join_bucketed", "window_lag_lead", "agg_stats",
    "string_funcs", "math_funcs",
    # MERGE / streaming join / sketch
    "scd2_upsert", "stream_join", "sketch_kmv",
    "udaf_grouped", "grouped_map",
    "surrogate_key_scale", "join_salted", "explode_split",
    # r5 additions: TPC-H Q1/Q4/Q6 in one slot, ANN recall floors, the
    # real image codec's pixel-level check, planted-duplicate invariants
    # for the approximate dedup family, and the S8 render goldens
    "tpch_suite", "tpch_suite2", "tpch_suite3", "ann_recall",
    "multimodal_decode", "dedup_invariants", "report_render",
    "approx_bounds",
    # component suites (each packs 2-5 single-operator qnames)
    # (columns_part_suite / distinct_suite / set_ops_suite /
    # window_suite / json_map_ops / semi_anti_suite / topk_ordered
    # rotated out in r5 — each has 2 green rows r2+r4; rotate back
    # in r6)
    "columns_lineitem_suite",
    # consolidated component suites for sources / cleaning / streaming
    # (array_ops rotated out in r5 — 3 green rows r1/r2/r4)
    "sources_suite", "clean_suite", "stream_windows_suite",
    "join_fact", "join_sortmerge",
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
