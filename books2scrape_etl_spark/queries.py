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

# ---------------------------------------------------------------------
# Registry ordering. The driver's CORRECTNESS harness checks at most the
# first ~50 entries, so order is load-bearing: WINDOW lists the 50
# qnames that together cover every SURVEY.md §2 component (suite qnames
# from query_defs3 stand in for groups of single-operator qnames); then
# every remaining oracle-paired qname (checked if the window is wider
# than 50); rows-only qnames go last — they yield only a weak rows>0
# signal and the real-stream ones are the slowest in the registry.
# ---------------------------------------------------------------------

# Round-8 rotation (VERDICT r7 item 1): the r7-green window rotates
# OUT; the window turns onto the waves-12–22 backlog — 54 oracle-paired
# qnames with zero driver rows. 31 of them ride the five new packed
# suites in query_defs33.py (each section re-runs the single's Spark
# callable and wraps its oracle SQL verbatim, both projections
# generated from one slot table); the heavy / iterative /
# scale-variant / streaming singles keep direct slots. Measured this
# session (sim, sf0.01, healthy host mode): graph_triangles 9.5 s,
# kmeans_invariants 14.0 s, graph_bfs 4.5 s, graph_walks 8.5 s — no
# semantic trimming needed (VERDICT item 2); the degraded-host 20-39 s
# readings were the documented cold/codegen mode, not the plans.
# Also in: the 15 qnames whose latest hard row is r5 (three rounds
# stale — window_lag_lead reclaims the slot als_topk borrowed in r7),
# the three qnames whose code changed this round (max_concurrency
# day-boundary rules, rate_limit_keys left join, negative_sampling
# self-join aliasing), and cohort_retention (weekly, query_defs9) —
# re-pinned after this round's un-shadowing fix (query_defs19's
# monthly twin had silently taken its registry name since r7; the
# monthly one debuts under cohort_retention_monthly).
#
# Round-9 rotation plan (write-ahead, the r7-verdict protocol): the
# r8-green window rotates out; first claim on r9 slots is the
# remaining never-driver-checked backlog — waves 23–32 minus this
# round's three code-changed rows: calendar_dim, apportion_budget,
# winsorize, zone_maps (w23); rank_correlation, weighted_quantiles,
# growth_mom_yoy, mode_stats (w24); attribution_last_touch,
# streak_islands, decile_transition, reconcile_daily (w25);
# twap_value, hazard_curve, table_checksum, topk_with_ties (w26);
# ttr_stats, group_split, histogram_2d (w27); seasonal_index,
# discount_qty_corr, adoption_curve (w28); burstiness, max_drawdown,
# cdf_probes, rank_shift (w29); bootstrap_se, dedup_keep_best (w30);
# k_anonymity, data_freshness (w31); fd_audit, change_point (w32) —
# plus wave 34 (scan_schema_drift, zorder_layout, packing_efficiency,
# added late r8 after the definitive sweeps, per-wave sims on top) —
# 35 qnames; pack waves 23-26 and 27-29 into two or three
# query_defs33-style suites (~16 singles packed) and budget
# change_point (~15 s at sf0.01). That leaves ~15 slots for r6-latest
# refreshers (the 47 r6-green qnames become three rounds stale in r9:
# suites first — agg_olap_suite, text_suite, sampling_suite,
# winnow_suite, scalar_funcs_suite, subquery_suite,
# pivot_unpivot_suite, then sketch/scan/join singles) plus the
# flagship/books_e2e/stream_windows_suite holdovers.
WINDOW: tuple[str, ...] = (
    # holdovers: flagship + the end-to-end DAG + the stream suite
    # (the stream suite row re-hashes the r7-added hopping/ohlc/source
    # sections — VERDICT r7 item 6)
    "flagship", "books_e2e", "stream_windows_suite",
    # waves 12-22 packed: 31 singles in 5 slots (query_defs33.py)
    "wave12_suite", "wave13_14_suite", "wave15_16_suite",
    "wave20_21_suite", "wave22_suite",
    # waves 12-22 direct: heavy / iterative / scale / streaming singles
    "ts_gapfill", "ohlc_bars", "feature_hashing",
    "quantile_normalize_scale", "kmeans_invariants", "stream_static_join",
    "sessionize_batch", "graph_triangles",
    "mv_incremental", "inverted_index",
    "graph_bfs", "pca_gram", "ts_interp",
    "topk_groups_scale", "ts_trend", "lorenz_deciles",
    "knn_confusion", "class_weights",
    "funnel_conversion", "cohort_retention_monthly", "profile_table",
    "edit_distance_pairs", "distinctive_terms",
    # code changed this round — each earns a fresh hard row
    "max_concurrency", "rate_limit_keys", "negative_sampling",
    # un-shadowed this round (weekly events cohort, query_defs9)
    "cohort_retention",
    # r5-latest refreshers (three rounds stale)
    "window_lag_lead", "agg_stats", "join_bucketed", "sketch_kmv",
    "stream_join", "scd2_upsert", "decontaminate", "corpus_build",
    "chunk_docs", "redact_pii", "sim_ann_probe", "ann_recall",
    "dedup_invariants", "report_render", "approx_bounds",
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
