"""Driver-facing query inventory (SURVEY.md §2 qnames).

Each entry: qname -> callable(spark, sf_dir) -> DataFrame, plus (where
SQL-expressible) a DuckDB oracle SQL string over the pre-registered
views ``region nation customer supplier part orders lineitem events
documents embeddings``. Column names are aliased identically on both
sides — the driver sorts columns by name before value-hashing.

Registration happens via the :func:`register` decorator (re-exported
from the leaf module :mod:`books2scrape_etl_spark.registry` — the
dicts live there so query_defs* modules never import THIS module; a
test importing a defs module directly used to trigger a circular
half-initialized import that tripped the WINDOW asserts below). This
module is the driver entry path: it imports every defs module and
fixes the registry order.
"""

from __future__ import annotations

from books2scrape_etl_spark.registry import (  # noqa: F401  (re-exports)
    ORACLE_SQL,
    QUERIES,
    SparkQuery,
    register,
)


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
from books2scrape_etl_spark import query_defs12  # noqa: E402,F401
from books2scrape_etl_spark import query_defs13  # noqa: E402,F401
from books2scrape_etl_spark import query_defs14  # noqa: E402,F401
from books2scrape_etl_spark import query_defs15  # noqa: E402,F401
from books2scrape_etl_spark import query_defs16  # noqa: E402,F401
from books2scrape_etl_spark import query_defs17  # noqa: E402,F401
from books2scrape_etl_spark import query_defs18  # noqa: E402,F401
from books2scrape_etl_spark import query_defs19  # noqa: E402,F401
from books2scrape_etl_spark import query_defs20  # noqa: E402,F401
from books2scrape_etl_spark import query_defs21  # noqa: E402,F401
from books2scrape_etl_spark import query_defs22  # noqa: E402,F401
from books2scrape_etl_spark import query_defs23  # noqa: E402,F401
from books2scrape_etl_spark import query_defs24  # noqa: E402,F401
from books2scrape_etl_spark import query_defs25  # noqa: E402,F401
from books2scrape_etl_spark import query_defs26  # noqa: E402,F401
from books2scrape_etl_spark import query_defs27  # noqa: E402,F401
from books2scrape_etl_spark import query_defs28  # noqa: E402,F401
from books2scrape_etl_spark import query_defs29  # noqa: E402,F401
from books2scrape_etl_spark import query_defs30  # noqa: E402,F401
from books2scrape_etl_spark import query_defs31  # noqa: E402,F401
from books2scrape_etl_spark import query_defs32  # noqa: E402,F401
from books2scrape_etl_spark import query_defs33  # noqa: E402,F401  (wraps earlier modules' oracles — keep after them)
from books2scrape_etl_spark import query_defs34  # noqa: E402,F401  (wraps defs4's packing oracle — keep last)
from books2scrape_etl_spark import query_defs35  # noqa: E402,F401  (wraps waves 23-32's oracles — keep after them)
from books2scrape_etl_spark import query_defs36  # noqa: E402,F401
from books2scrape_etl_spark import query_defs37  # noqa: E402,F401

# ---------------------------------------------------------------------
# Registry ordering. The driver's CORRECTNESS harness checks at most the
# first ~50 entries, so order is load-bearing: WINDOW lists the 50
# qnames that together cover every SURVEY.md §2 component (suite qnames
# from query_defs3 stand in for groups of single-operator qnames); then
# every remaining oracle-paired qname (checked if the window is wider
# than 50); rows-only qnames go last — they yield only a weak rows>0
# signal and the real-stream ones are the slowest in the registry.
# ---------------------------------------------------------------------

# Round-9 rotation (executes the write-ahead plan recorded here last
# round): the r8-green window rotates OUT; the slots go to the
# never-driver-checked backlog — waves 23-32 (31 qnames; 30 ride the
# four new packed suites in query_defs35.py, change_point keeps a
# direct slot as the group's ~15 s heavy) and wave 34 (landed after
# r8's definitive sweeps). Also in: the three rows-only->invariant
# conversions made this round (bin_quantile_scale agreement law,
# dedup_simhash signature-distance laws, embed_near_dup planted
# scaled-copy laws — each now oracle-paired, VERDICT r8 item 5),
# rfm_segments (code changed: quintiles now route through
# operators.scale.ntile_scale, VERDICT r8 item 7), the five defs33
# suites (code changed: suite-section SQL now qualifies slot sources,
# ADVICE r8), and 18 of the 46 r6-latest refreshers (suites first —
# each packs many singles — then dedup/similarity/sketch/scan/join
# singles), plus the flagship/books_e2e/stream_windows_suite
# holdovers.
#
# Round-10 rotation plan (write-ahead, the r7-verdict protocol): the
# r9-green window rotates out; first claim on r10 slots is (a) the
# TEN qnames converted rows-only -> oracle-paired in the r9 third
# continuation, none of which has ever had a hard driver row in its
# oracle-paired form - pack_ffd, dedup_cc_star, embed_generate,
# stream_tumbling_rt, stream_dedup_rt, stream_stateful_rt,
# stream_join_rt, stream_foreachbatch_rt, stream_books_star_rt,
# books_stream_source_rt - then (b) the 16
# r6-latest qnames that didn't fit this round's refresher allotment -
# variant_ops, token_budget, topk_ordered, lm_quality, dq_audit,
# outlier_zscore, embed_norm, embed_quantize, multimodal_bytes,
# multimodal_resize, recursive_cte, scale_invariants, funnel_steps,
# avi_frames, compact_files, window_range_time, plus sql_api (ceded
# its r9 slot to the new cc_exact) and the round-9-continuation
# additions line_dedup / parse_struct_expand / explode_links (new
# oracle-paired, never driver-rowed) - after which every
# oracle-paired qname's hard row is r7 or newer; the remaining ~30
# slots go to the then-three-rounds-stale r7 cohort (tpch suites and
# singles, join_fact/join_sortmerge/join_salted/join_asof, sources/
# clean/columns suites, grouped_map/udaf_grouped, graph_degree,
# als_topk, stratified/weighted sampling, snapshot_cdc,
# partition_pruning, window_hopping, zorder_cluster) prioritized the
# same way: suites first, then heavy singles.
WINDOW: tuple[str, ...] = (
    # holdovers: flagship + the end-to-end DAG + the stream suite
    "flagship", "books_e2e", "stream_windows_suite",
    # waves 23-32 packed: 30 singles in 4 slots (query_defs35.py)
    "wave23_24_suite", "wave25_26_suite", "wave27_29_suite",
    "wave30_32_suite",
    # waves 23-32/34 direct: the CUSUM heavy + late-landing wave 34
    "change_point", "scan_schema_drift", "zorder_layout",
    "packing_efficiency",
    # rows-only -> invariant-oracle conversions (VERDICT r8 item 5)
    "bin_quantile_scale", "dedup_simhash", "embed_near_dup",
    # code changed this round - each earns a fresh hard row
    # (rfm_segments: ntile_scale routing; defs33 suites: qualified
    # suite-section SQL)
    "rfm_segments",
    "wave12_suite", "wave13_14_suite", "wave15_16_suite",
    "wave20_21_suite", "wave22_suite",
    # r6-latest refreshers (three rounds stale): suites first
    "agg_olap_suite", "text_suite", "sampling_suite", "winnow_suite",
    "scalar_funcs_suite", "subquery_suite", "pivot_unpivot_suite",
    "columns_part_suite", "distinct_suite", "semi_anti_suite",
    "set_ops_suite", "window_suite",
    # r6-latest refreshers: dedup/similarity/corpus singles
    "dedup_exact", "sim_cosine", "ngram_jaccard", "corpus_curation",
    "corpus_mixture", "pack_next_fit",
    # r6-latest refreshers: sketch/join/scan singles
    "sketch_cms", "sketch_kmv_setops", "heavy_hitters", "join_bloom",
    "join_skew_aqe", "fuzzy_join",
    "scan_jsonl", "scan_merge_schema", "scan_orc",
    "json_map_ops", "date_funcs",
    # round-9 continuation: exact-value CC differential (new qname —
    # upgrades both iterative connected-components operators from
    # law-checked to value-exact vs a DuckDB recursive-CTE closure).
    # sql_api ceded its refresher slot; it joins the r10 rotation.
    "cc_exact",
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


# Driver-side GC tuning. Plan construction is Py4J-heavy (thousands of
# short-lived Column/expression temporaries per query); CPython's
# generational GC triggers on allocation counts, and every pass scans
# the tracked heap — which these 34 defs modules just grew by ~100k
# permanent objects. Measured on this host (sf0.1, warm JVM):
# dedup_minhash plan-build+run 5.5-6.5 s with the full registry
# imported vs 2.2-2.3 s with either (a) only one defs module imported
# or (b) gc.freeze() after registration. Freezing moves the permanent
# module graph out of every future collection — exactly the CPython
# long-lived-process recipe — and is safe here: registry contents are
# process-lifetime by construction.
#
# NOT an import side effect (ADVICE r8): freezing at import time would
# also permanently exempt whatever caller state happens to be alive
# (pytest internals, half-built fixtures) from cycle collection. Each
# perf entry point (bench.py, scripts/bench_warm.py, the driver
# contract's __spark_entry__.queries()/entry(), tests/conftest.py's
# session fixture) calls this explicitly AFTER its own setup instead.
# Idempotent; opt out with SPARK_GRAFT_GC_FREEZE=0.
_FROZEN = False


def freeze_registry_heap() -> None:
    global _FROZEN
    if _FROZEN:
        return
    import gc
    import os

    if os.environ.get("SPARK_GRAFT_GC_FREEZE", "1") == "0":
        return
    gc.collect()
    gc.freeze()
    _FROZEN = True
