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

# Round-10 rotation (executes the write-ahead plan recorded here last
# round, plus the two qnames VERDICT r9 flagged as omitted —
# udtf_sentences and books_datasource — and the round's one new wave,
# join_dpp): the r9-green window rotates OUT. Slots:
#   (a) the TEN r9c rows-only -> oracle-paired conversions, none of
#       which ever had a hard driver row in oracle-paired form;
#   (b) the 16 r6-latest refreshers that didn't fit r9's allotment;
#   (c) sql_api (ceded its r9 slot to cc_exact) + the three r9
#       continuation qnames never driver-rowed (line_dedup,
#       parse_struct_expand, explode_links) + udtf_sentences +
#       books_datasource (VERDICT r9 item 1's two additions);
#   (d) join_dpp — the new §4.2 dynamic-partition-pruning qname
#       (VERDICT r9 item 2), earning its first row;
#   (e) the remaining 17 slots to the three-rounds-stale r7 cohort,
#       suites first (tpch_suite/2/3 pack 16 TPC-H shapes; sources/
#       clean/columns_lineitem pack the scrape+clean singles), then
#       the heavy join/groupBy singles.
# After this window runs green, every oracle-paired qname in the
# registry has a hard driver row, r7 or newer (VERDICT r9 item 1).
#
# Round-11 rotation plan (write-ahead, the r7-verdict protocol): the
# r10-green window rotates out; first claim on r11 slots is the r8
# cohort (42 qnames, then three rounds stale) — suites and packed
# groups first (sim_ann_probe, ann_recall, dedup_invariants,
# sketch_kmv, scd2_upsert, mv_incremental, join_bucketed,
# stream_join, stream_static_join, redact_pii, chunk_docs,
# decontaminate, corpus_build, and the wave-9-22 singles riding
# their suites where one exists), then the r7 leftovers that did not
# fit r10 (tpch_q3/q5/q10/q12/q14/q18 singles, multimodal_decode,
# asof_join_general, surrogate_key_scale, pagerank_invariants,
# als_invariants, ewma_decay, bpe_pairs, tfidf_bm25, tokenize_ids,
# explode_split, graph-family singles), prioritized the same way:
# never/oldest hard row first, suites before singles, heavies get
# direct slots. Holdover candidates: flagship + books_e2e return
# after their r10 rest (both r9-green, both bench-pinned every
# round).
WINDOW: tuple[str, ...] = (
    # (a) r9c rows-only -> oracle-paired conversions, first hard rows
    "stream_tumbling_rt", "stream_dedup_rt", "stream_stateful_rt",
    "stream_join_rt", "stream_foreachbatch_rt", "stream_books_star_rt",
    "books_stream_source_rt", "pack_ffd", "dedup_cc_star",
    "embed_generate",
    # (b) r6-latest refreshers
    "variant_ops", "token_budget", "topk_ordered", "lm_quality",
    "dq_audit", "outlier_zscore", "embed_norm", "embed_quantize",
    "multimodal_bytes", "multimodal_resize", "recursive_cte",
    "scale_invariants", "funnel_steps", "avi_frames", "compact_files",
    "window_range_time",
    # (c) never-rowed singles + the two VERDICT r9 additions
    "sql_api", "line_dedup", "parse_struct_expand", "explode_links",
    "udtf_sentences", "books_datasource",
    # (d) the round's one new wave: dynamic partition pruning
    "join_dpp",
    # (e) r7 cohort refreshers: suites first, then heavy singles
    "tpch_suite", "tpch_suite2", "tpch_suite3",
    "sources_suite", "clean_suite", "columns_lineitem_suite",
    "join_fact", "join_sortmerge", "join_salted", "join_asof",
    "grouped_map", "udaf_grouped", "graph_degree", "als_topk",
    "snapshot_cdc", "partition_pruning", "window_hopping",
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
