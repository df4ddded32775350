"""Wave-5 qnames (VERDICT r3 items 4/5/7): the formerly-orphaned
context-window chunker and PII redactor become oracle-paired driver
rows; the three winnow consumers (fingerprint / candidate pairs /
decontamination) consolidate into ONE suite qname sharing ONE
fingerprint pass; and the IVF ANN path gets a hash-match row via full
probing (``n_probe = n_lists`` provably reproduces brute force — the
recall dial ends at correctness, so the 100 TB similarity plumbing is
value-verified, not just unit-tested).

No reference analogue for any of these (the reference emits one CSV
row per book, extract_pipeline.py:10-94) — all four are part of the
LLM-data-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register
# Registration-order dep: wraps sampling oracles from query_defs4.
from books2scrape_etl_spark import query_defs4 as _dep4  # noqa: F401,E402
from books2scrape_etl_spark.query_defs import BRUTE_TOPK_SQL
from books2scrape_etl_spark.query_defs4 import _WINNOW_FPS_CTE
from books2scrape_etl_spark.operators import similarity
from books2scrape_etl_spark.operators.chunking import chunk_docs, oracle_chunk_sql
from books2scrape_etl_spark.operators.privacy import (
    PATTERNS,
    oracle_count_sql,
    oracle_redact_sql,
    pii_stats,
)


# =====================================================================
# winnow suite — fingerprint + candidate pairs + decontamination in one
# qname over ONE shared fingerprint pass (frees window slots AND gives
# `decontaminate` the hard driver signal it lacked in rounds 2-3).
# =====================================================================


@register(
    "winnow_suite",
    f"""
    WITH {_WINNOW_FPS_CTE},
    keep AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 50),
    kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN keep USING (fp)),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared
      FROM kept a JOIN kept b USING (fp)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3),
    bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 50 = 0),
    train AS (SELECT doc_id, fp FROM fps WHERE doc_id % 50 <> 0),
    decon AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM train JOIN bench USING (fp)
      GROUP BY doc_id HAVING COUNT(*) >= 3)
    SELECT 'fp' AS section, doc_id AS a, fp AS b, CAST(NULL AS BIGINT) AS v FROM fps
    UNION ALL
    SELECT 'cand' AS section, id_a AS a, id_b AS b, shared AS v FROM cand
    UNION ALL
    SELECT 'decon' AS section, doc_id AS a, CAST(NULL AS BIGINT) AS b, n_shared AS v
    FROM decon
    """,
)
def q_winnow_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 + L11 in one pass (operators/winnow.py): the per-document
    winnowing fingerprint table (k=8, w=8), the ≥3-shared candidate
    pairs over it (df cap 50 — the skew guard), and the benchmark
    decontamination flags (docs sharing ≥3 fingerprints with the 2%
    held-out set doc_id % 50 = 0). The fingerprint pass — the expensive
    map-side scan — runs ONCE (localCheckpoint) and feeds all three
    sections; sections union into (section, a, b, v) so one value-hash
    pins every fingerprint, every pair, and every contamination count."""
    from books2scrape_etl_spark.operators.winnow import (
        decontaminate,
        winnow_candidates,
        winnow_fingerprints,
    )

    docs = read_table(spark, "documents", sf_dir)
    fps = winnow_fingerprints(docs, k=8, w=8).localCheckpoint(eager=True)
    cand = winnow_candidates(docs, max_df=50, min_shared=3, fps=fps)
    decon = decontaminate(docs, F.col("doc_id") % 50 == 0, min_shared=3, fps=fps)
    null_b = F.lit(None).cast("bigint")
    return (
        fps.select(
            F.lit("fp").alias("section"),
            F.col("doc_id").alias("a"),
            F.col("fp").alias("b"),
            null_b.alias("v"),
        )
        .unionAll(
            cand.select(
                F.lit("cand").alias("section"),
                F.col("id_a").alias("a"),
                F.col("id_b").alias("b"),
                F.col("shared").alias("v"),
            )
        )
        .unionAll(
            decon.select(
                F.lit("decon").alias("section"),
                F.col("doc_id").alias("a"),
                null_b.alias("b"),
                F.col("n_shared").alias("v"),
            )
        )
    )


# =====================================================================
# context-window chunking (operators/chunking.py — wired, VERDICT item 4)
# =====================================================================


@register("chunk_docs", oracle_chunk_sql(chunk_words=64, overlap=16))
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/chunking.py:chunk_docs):
    overlapping 64-word chunks, 16-word overlap (stride 48) — the 1→N
    shaping step between corpus and training shard. Pure Catalyst
    (split → sequence → posexplode → slice → array_join): the fan-out
    happens inside whole-stage codegen, no shuffle, no Python. The
    oracle replays the identical boundary formula with DuckDB
    generate_series + list_slice, pinning every chunk string."""
    docs = read_table(spark, "documents", sf_dir)
    return chunk_docs(docs, chunk_words=64, overlap=16)


# =====================================================================
# PII redaction (operators/privacy.py — wired, VERDICT item 4)
# =====================================================================

# Deterministically plant PII so every category actually fires: the
# corpus text is public-catalog-clean, so without planting, the qname
# would verify only the no-match path of all five patterns.
def _pii_suffix_spark() -> list:
    # built lazily — Column constructors need an active SparkContext
    return [
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit(
            "@example.com or 555-867-5309; ssn 987-65-4329;"
            " card 4111 1111 1111 1111; host 10.0.0."
        ),
        (F.col("doc_id") % 256).cast("string"),
    ]


_PII_SUFFIX_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or 555-867-5309; ssn 987-65-4329;"
    " card 4111 1111 1111 1111; host 10.0.0.' || "
    "CAST(doc_id % 256 AS VARCHAR)"
)


@register(
    "redact_pii",
    f"""
    WITH p AS (SELECT doc_id, {_PII_SUFFIX_SQL} AS text FROM documents)
    SELECT doc_id,
           {", ".join(
               f"CAST({oracle_count_sql('text', name)} AS INTEGER) AS {name}_hits"
               for name, _, _ in PATTERNS
           )},
           {oracle_redact_sql('text')} AS redacted
    FROM p
    """,
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/privacy.py): per-category match counts
    on the original text plus the redacted text, over documents with a
    deterministic planted-PII suffix (email, phone, SSN, card, IPv4 —
    all five patterns exercise their match path on every row, not just
    no-match). Pure chained regexp_replace — JVM-side, codegen'd, zero
    shuffle; the ordered pattern tuple is the cross-engine contract the
    DuckDB oracle replays with nested regexp_replace(..., 'g')."""
    docs = read_table(spark, "documents", sf_dir).select(
        "doc_id", F.concat(F.col("text"), *_pii_suffix_spark()).alias("text")
    )
    return pii_stats(docs, "text").select(
        "doc_id", *[f"{name}_hits" for name, _, _ in PATTERNS], "redacted"
    )


# =====================================================================
# ANN full-probe (VERDICT item 7 — hash-match row for the scale path)
# =====================================================================


# the oracle IS sim_cosine's brute-force SQL (one shared definition in
# query_defs.py): full probing must reproduce the exact result
@register("sim_ann_probe", BRUTE_TOPK_SQL)
def q_sim_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path, value-verified: IVF ANN top-5 probing ALL lists
    (``n_probe = n_lists = 8``) — the lists partition the corpus, so
    full probing is provably identical to brute force while exercising
    the ENTIRE production path (k-means quantizer, codegen'd argmin
    assignment, equi-join on list_id, per-query top-k). The oracle is
    the exact brute-force SQL: any indexing/assignment/join bug breaks
    the hash. Recall-vs-exact for partial probing is unit-tested at
    tests/test_training_ops.py."""
    emb = read_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.ivf_topk(emb, queries, k=5, n_lists=8, n_probe=8)


# =====================================================================
# weighted (quality-proportional) sampling — L7 companion
# =====================================================================


@register(
    "weighted_sample",
    """
    WITH s AS (
      SELECT doc_id, n_chars,
             least(1.0, n_chars / 2000.0) AS w,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 4294967296 AS hv
      FROM documents)
    SELECT doc_id, n_chars, w FROM s WHERE hv < w * 4294967296.0
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling (operators/sampling.py:
    weighted_sample): keep each document with probability equal to its
    quality proxy (here length-based: min(1, n_chars/2000)), the
    hash-for-RNG Bernoulli draw — same survivors every run, any cluster
    size, any engine. The oracle re-derives weight, hash, and threshold
    independently, so the exact kept subset is value-matched. Pure
    projection + filter: zero shuffles at any scale."""
    from books2scrape_etl_spark.operators.sampling import weighted_sample

    docs = read_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    w = F.least(F.lit(1.0), F.col("n_chars") / F.lit(2000.0))
    return weighted_sample(docs, w, "doc_id")


# =====================================================================
# sampling suite — split + shards + stratified + weighted in one window
# slot (VERDICT r3 item: shuffle_shards / stratified_sample were
# oracle-paired but outside the 50-entry window; the suite gives all
# four sampling ops one in-window hash row)
# =====================================================================


def _register_sampling_suite() -> None:
    # composed AFTER the singles register (import-order dependency on
    # their ORACLE_SQL entries, same pattern as query_defs4's suites)
    from books2scrape_etl_spark.registry import ORACLE_SQL

    oracle = f"""
    SELECT 'split' AS kind, CAST(doc_id AS BIGINT) AS k1,
           CAST(bucket AS BIGINT) AS k2, split AS s,
           CAST(NULL AS INTEGER) AS n, CAST(NULL AS DOUBLE) AS v
    FROM ({ORACLE_SQL["split_train_test"]})
    UNION ALL
    SELECT 'shard', CAST(doc_id AS BIGINT), CAST(sort_key AS BIGINT),
           CAST(shard AS VARCHAR), CAST(pos AS INTEGER), CAST(NULL AS DOUBLE)
    FROM ({ORACLE_SQL["shuffle_shards"]})
    UNION ALL
    SELECT 'strat', CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
           lang || '|' || source, CAST(rn AS INTEGER), CAST(NULL AS DOUBLE)
    FROM ({ORACLE_SQL["stratified_sample"]})
    UNION ALL
    SELECT 'wsamp', CAST(doc_id AS BIGINT), CAST(n_chars AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), w
    FROM ({ORACLE_SQL["weighted_sample"]})
    """

    @register("sampling_suite", oracle)
    def q_sampling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
        """L7 + L13 in one window slot: deterministic 90/5/5 split,
        md5-permutation shuffle-sharding, stratified quota sample, and
        quality-weighted Bernoulli sample — every sampling primitive a
        training-data pipeline needs, union-normalized to (kind, k1,
        k2, s, n, v) so one value hash pins each document's split,
        shard+position, stratum rank, and kept/weight. All four are
        hash-rule projections (no RNG): the oracle re-derives every
        assignment independently."""
        null_i = F.lit(None).cast("int")
        null_d = F.lit(None).cast("double")
        sp = QUERIES["split_train_test"](spark, sf_dir).select(
            F.lit("split").alias("kind"),
            F.col("doc_id").cast("long").alias("k1"),
            F.col("bucket").cast("long").alias("k2"),
            F.col("split").alias("s"),
            null_i.alias("n"),
            null_d.alias("v"),
        )
        sh = QUERIES["shuffle_shards"](spark, sf_dir).select(
            F.lit("shard").alias("kind"),
            F.col("doc_id").cast("long").alias("k1"),
            F.col("sort_key").cast("long").alias("k2"),
            F.col("shard").cast("string").alias("s"),
            F.col("pos").cast("int").alias("n"),
            null_d.alias("v"),
        )
        st = QUERIES["stratified_sample"](spark, sf_dir).select(
            F.lit("strat").alias("kind"),
            F.col("doc_id").cast("long").alias("k1"),
            F.lit(None).cast("long").alias("k2"),
            # F.concat, not concat_ws: the oracle's `lang || '|' || source`
            # is null-PROPAGATING and concat_ws null-SKIPS — parity must
            # not depend on lang/source being non-null in the testdata
            F.concat(F.col("lang"), F.lit("|"), F.col("source")).alias("s"),
            F.col("rn").cast("int").alias("n"),
            null_d.alias("v"),
        )
        ws = QUERIES["weighted_sample"](spark, sf_dir).select(
            F.lit("wsamp").alias("kind"),
            F.col("doc_id").cast("long").alias("k1"),
            F.col("n_chars").cast("long").alias("k2"),
            F.lit(None).cast("string").alias("s"),
            null_i.alias("n"),
            F.col("w").alias("v"),
        )
        return sp.union(sh).union(st).union(ws)


from books2scrape_etl_spark.registry import QUERIES  # noqa: E402

_register_sampling_suite()


# =====================================================================
# two more classic TPC-H shapes (breadth past the window; the bench
# headline keeps its stable 16-query list)
# =====================================================================


@register(
    "tpch_q10",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): rank customers by
    revenue lost to returns. Fact-fact join on orderkey, returnflag
    filter pushed to the lineitem scan, broadcast nation dim, exact-
    decimal revenue, TakeOrderedAndProject top-20 with a custkey
    tiebreak."""
    from books2scrape_etl_spark.functions.agg import sum_exact

    c = read_table(spark, "customer", sf_dir)
    o = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    n = read_table(spark, "nation", sf_dir)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                sum_exact(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q12",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority classes), adapted to the
    testdata's columns (l_linestatus stands in for shipmode): one year
    of shipments, lines counted into high/low priority classes via
    conditional aggregation. The year bound is a sargable half-open
    timestamp range (pushed to the scan on both engines); counts are
    BIGINT-cast in the oracle (DuckDB SUM->HUGEINT rule)."""
    from books2scrape_etl_spark.query_defs import _utc
    from books2scrape_etl_spark.query_defs6 import _ts_year_range

    _utc(spark)
    o = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir).where(_ts_year_range("l_shipdate", 1996))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "stratified_threshold",
    """
    WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS _n
      FROM documents GROUP BY lang, source),
    s AS (
      SELECT d.doc_id, d.lang, d.source,
             least(1.0, 3.0 / c._n) AS _frac,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 4294967296 AS hv
      FROM documents d JOIN c
        ON d.lang IS NOT DISTINCT FROM c.lang
       AND d.source IS NOT DISTINCT FROM c.source)
    SELECT doc_id, lang, source, _frac FROM s WHERE hv < _frac * 4294967296.0
    """,
)
def q_stratified_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-stratum scale form of stratified sampling
    (operators/sampling.py:stratified_sample_threshold): per-stratum
    keep threshold = quota / stratum count, applied as a map-side hash
    filter — no per-stratum rank window, no sequential sort, expected
    (not exact) quota. Deterministic and engine-portable: the oracle
    re-derives stratum counts, thresholds, and the exact kept subset."""
    from books2scrape_etl_spark.operators.sampling import stratified_sample_threshold

    docs = read_table(spark, "documents", sf_dir).select("doc_id", "lang", "source")
    return stratified_sample_threshold(docs, ["lang", "source"], "doc_id", 3)


@register(
    "tpch_q14",
    """
    SELECT round(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                        AS DECIMAL(18,4))
                              ELSE CAST(0 AS DECIMAL(18,4)) END)
                      AS DOUBLE), 4) AS promo_revenue,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): conditional revenue vs total
    revenue over one shipment year, part dim broadcast. Both sums stay
    exact-decimal and are emitted SEPARATELY rather than as the classic
    ratio — the ratio's IEEE division is trivially derivable while two
    exact sums hash-verify without any float-rounding hazard."""
    from books2scrape_etl_spark.functions.agg import sum_exact
    from books2scrape_etl_spark.query_defs import _utc
    from books2scrape_etl_spark.query_defs6 import _ts_year_range

    _utc(spark)
    li = read_table(spark, "lineitem", sf_dir).where(_ts_year_range("l_shipdate", 1997))
    p = read_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(sum_exact(promo, 4), 4).alias("promo_revenue"),
            F.round(sum_exact(rev, 4), 4).alias("total_revenue"),
        )
    )


@register(
    "tpch_q18",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           round(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big ON o.o_orderkey = big.l_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    quantity exceeds 300, rejoined to customer detail. The HAVING
    pre-aggregation is a semi-join-shaped reduction BEFORE the 3-way
    join (only big orderkeys reach it — at scale the small 'big' set is
    broadcast by AQE); exact-decimal quantity sums; top-100 via
    TakeOrderedAndProject with an orderkey tiebreak."""
    from books2scrape_etl_spark.functions.agg import sum_exact

    li = read_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(sum_exact("l_quantity", 2).alias("_q"))
        .where(F.col("_q") > 300)
        .select("l_orderkey")
    )
    c = read_table(spark, "customer", sf_dir)
    o = read_table(spark, "orders", sf_dir)
    return (
        li.join(big, "l_orderkey")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(sum_exact("l_quantity", 2), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
