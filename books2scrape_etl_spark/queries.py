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
from books2scrape_etl_spark import query_defs10  # noqa: E402,F401  (wraps earlier modules' oracles — keep after them)
from books2scrape_etl_spark import query_defs11  # noqa: E402,F401

# ---------------------------------------------------------------------
# Registry ordering. The driver's CORRECTNESS harness checks at most the
# first ~50 entries, so order is load-bearing: WINDOW lists the 50
# qnames that together cover every SURVEY.md §2 component (suite qnames
# from query_defs3 stand in for groups of single-operator qnames); then
# every remaining oracle-paired qname (checked if the window is wider
# than 50); rows-only qnames go last — they yield only a weak rows>0
# signal and the real-stream ones are the slowest in the registry.
# ---------------------------------------------------------------------

# Round-6 rotation (VERDICT r5 item 1): every wave-9 qname that has
# never occupied a driver slot rotates IN (21 entries — the 20 from
# query_defs9 plus multimodal_resize), together with 2 new wave-10
# rows (join_skew_aqe — the AQE skew-split demo; scale_invariants —
# the constant-oracle invariant suite that value-verifies
# bin_quantile_scale / pack_ffd / embed_generate) and 22 returners
# whose newest green row is r4 or older. Two of the returner slots are
# new packing suites (agg_olap_suite = rollup+cube+grouping_sets+
# having; text_suite = text_stats+lang_dist+vocab_topk+
# repetition_stats), so 8 stale singles refresh through 2 slots.
# 5 holdovers keep continuous coverage of the flagship and the widest
# suites. Every r5-green window entry rotates OUT to the
# just-past-window oracle-paired block (each now holds >=1 hard r5
# row); rotate them back in r7.
#
# After r6 the only oracle-paired qnames with NO green row r5-r6 are
# ones whose newest evidence is a green r5/r6 SUITE containing them
# verbatim, plus partition_pruning / array_ops / asof_join_general /
# tpch_q3 / tpch_q5 (2-3 direct green rows each across r1-r4).
#
# r7 ROTATION PLAN: swap the r6-green window rows out and swap in the
# round-6 late additions (tfidf_bm25, snapshot_cdc, group_percentiles,
# bpe_pairs, zorder_cluster, ewma_decay, tokenize_ids, graph_degree,
# pagerank_invariants, als_invariants, window_hopping — all driver-sim green at
# sf0.01 AND sf0.1 this round but past the window), plus the
# r5-single-green rows (tpch_q10/q12/q14/q18, pivot, unpivot,
# subquery singles, string_funcs, math_funcs, sampling singles) and
# any returners still on r<=4 evidence (partition_pruning, array_ops,
# asof_join_general, tpch_q3/q5). Note pagerank_invariants costs
# ~11-22 s per run (10 training rounds with per-round actions) —
# budget its slot accordingly.
WINDOW: tuple[str, ...] = (
    # holdovers: flagship + the end-to-end DAG + the widest suites
    "flagship", "books_e2e", "stream_windows_suite",
    "winnow_suite", "sampling_suite",
    # wave-9 (first driver slots): frequency sketches + corpus scoring
    "sketch_cms", "heavy_hitters", "lm_quality", "token_budget",
    "embed_quantize", "sketch_kmv_setops",
    # wave-9: event analytics
    "funnel_steps", "cohort_retention",
    # wave-9: formats / layout / maintenance
    "scan_jsonl", "scan_orc", "scan_merge_schema", "compact_files",
    # wave-9: SQL surface + runtime filters + frames
    "join_bloom", "window_range_time", "variant_ops", "recursive_cte",
    # wave-9: quality / linkage / outliers / codecs
    "dq_audit", "fuzzy_join", "outlier_zscore", "avi_frames",
    "multimodal_resize",
    # wave-10: invariant suite for the approximate scale operators
    "scale_invariants",
    # returners (newest green row r4 or older) — component suites first
    "columns_part_suite", "distinct_suite", "semi_anti_suite",
    "set_ops_suite", "window_suite", "topk_ordered", "json_map_ops",
    "scalar_funcs_suite", "subquery_suite", "pivot_unpivot_suite",
    "date_funcs", "sql_api",
    # returners — new packing suites (8 stale singles in 2 slots)
    "agg_olap_suite", "text_suite",
    # returners — high-value singles
    "corpus_curation", "sim_cosine", "embed_norm", "multimodal_bytes",
    "dedup_exact", "ngram_jaccard", "corpus_mixture", "pack_next_fit",
    # wave-10 AQE skew join LAST: it (briefly) tunes session AQE confs
    # under a restore-guard; last-slot placement bounds any interaction
    "join_skew_aqe",
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
