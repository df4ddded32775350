"""Wave-10 qnames (round 6): the AQE skew-join scale demo, the
invariant suite that value-verifies the three remaining approximate /
non-SQL-twin scale operators, and two packing suites that refresh
driver evidence for eight rotated-out OLAP/text returners in two
window slots.

- ``join_skew_aqe`` — deliberately skewed sort-merge join handled by
  AQE's runtime skew split (operators/scale.skew_join); the oracle is
  the PLAIN join (skew handling must be invisible in the result), and
  a plan test pins ``skew=true`` on the join node.
- ``scale_invariants`` — constant-oracle invariant rows (the
  ``ann_recall`` pattern) for ``bin_quantile_scale`` (approx-edge
  agreement with exact percentile labels), ``pack_ffd`` (capacity /
  partition / not-worse-than-next-fit), and ``embed_generate``
  (bit-determinism under repartitioning, unit norms). These three
  qnames stay registered as rows-only singles; this suite is their
  in-window value signal.
- ``agg_olap_suite`` — agg_rollup + agg_cube + grouping_sets +
  agg_having union-normalized into one slot, oracle composed by
  wrapping the singles' registered oracle SQL (the query_defs4 suite
  contract: a value change in any component flips the suite hash).
- ``text_suite`` — text_stats + lang_dist + vocab_topk +
  repetition_stats, same contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.agg import oracle_sum_exact, sum_exact
from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import ORACLE_SQL, QUERIES, register
# Registration-order deps: wraps agg/text oracles from defs 1/2/4.
from books2scrape_etl_spark import query_defs as _dep1  # noqa: F401,E402
from books2scrape_etl_spark import query_defs2 as _dep2  # noqa: F401,E402
from books2scrape_etl_spark import query_defs4 as _dep4  # noqa: F401,E402

_SKEW_KEY_SQL = "CASE WHEN l_orderkey % 10 < 8 THEN 1 ELSE 1 + l_orderkey % 100 END"

_JOIN_SKEW_SQL = f"""
WITH l AS (
  SELECT {_SKEW_KEY_SQL} AS k, l_returnflag, l_quantity FROM lineitem
),
r AS (SELECT s_suppkey AS kd, s_name FROM supplier)
SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(r.kd) AS BIGINT) AS sum_keys,
       {oracle_sum_exact('l.l_quantity', 2)} AS sum_qty
FROM l JOIN r ON r.kd = l.k
GROUP BY 1
"""


@register("join_skew_aqe", _JOIN_SKEW_SQL)
def q_join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path — AQE runtime skew-join split: ~80% of the fact rows
    share one join key (the CASE collapses 8/10 orderkeys onto key 1),
    so the shuffle puts them in one oversized partition; AQE detects it
    at runtime, splits it along map-output blocks, and replicates the
    matching dim partition — salting's job with no key rewrite. The
    oracle replays the PLAIN join: skew handling may not change a
    single value. ``skew=true`` on the SortMergeJoin node is pinned by
    tests/test_plans.py. The repartition(16) exists because skew
    splitting needs multiple map outputs (see skew_join's docstring);
    at cluster scale the fact side always has them."""
    from books2scrape_etl_spark.operators import scale

    li = read_table(spark, "lineitem", sf_dir).repartition(16)
    hot = F.when(F.col("l_orderkey") % 10 < 8, F.lit(1)).otherwise(
        1 + F.col("l_orderkey") % 100
    )
    left = li.select(hot.alias("k"), "l_returnflag", "l_quantity")
    right = read_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("kd"), "s_name"
    )
    joined = scale.skew_join(spark, left, right, "k", "kd")
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("kd").cast("bigint").alias("sum_keys"),
        sum_exact("l_quantity", 2).alias("sum_qty"),
    )


_SCALE_INVARIANTS_SQL = """
SELECT 'quantile_agreement_ge_95' AS check_name, TRUE AS ok
UNION ALL SELECT 'ffd_capacity', TRUE
UNION ALL SELECT 'ffd_partition', TRUE
UNION ALL SELECT 'ffd_packs_le_next_fit', TRUE
UNION ALL SELECT 'embed_deterministic', TRUE
UNION ALL SELECT 'embed_unit_norm', TRUE
"""


@register("scale_invariants", _SCALE_INVARIANTS_SQL)
def q_scale_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-oracle invariants for the three approximate/non-SQL
    scale operators (the ann_recall pattern — a regression flips an
    ``ok`` to false and breaks the value hash):

    - quantile_agreement_ge_95: ``bin_quantile_approx`` (GK-sketch
      edges, no global sort) labels >= 95% of lineitem rows identically
      to exact-percentile-edge labels.
    - ffd_*: first-fit-decreasing packing respects capacity (oversized
      docs alone in their pack), emits every doc exactly once, and
      never uses more packs than next-fit (the hypothesis-tested kernel
      law from tests/test_properties.py, checked on real data).
    - embed_*: the mapInPandas embedding forward pass is bit-identical
      under a different partitioning, and every non-zero vector is
      unit-norm to 1e-6 (the forward pass normalizes in float32 before
      widening to float64, so ~1e-8 residuals are expected; 1e-6 is
      the honest float32 bound with margin).

    All checks stay lazy DataFrame aggregates stitched by 1-row joins;
    no collect."""
    from books2scrape_etl_spark.operators.binning import bin_quantile_approx
    from books2scrape_etl_spark.operators.inference import embed_generate
    from books2scrape_etl_spark.operators.packing import (
        pack_first_fit_decreasing,
        pack_next_fit,
        pack_stats,
    )

    def row(name: str, ok_df: DataFrame) -> DataFrame:
        # ok_df: 1-row frame with a boolean column `ok`
        return ok_df.select(F.lit(name).alias("check_name"), "ok")

    # -- quantile agreement ------------------------------------------
    li = read_table(spark, "lineitem", sf_dir).select("l_extendedprice")
    labels = ("Budget", "Standard", "Premium")
    approx = bin_quantile_approx(li, "l_extendedprice", labels, out_col="t_approx")
    edges = (
        li.agg(
            F.percentile("l_extendedprice", F.array(F.lit(1 / 3), F.lit(2 / 3))).alias("e")
        )
        .select(F.col("e")[0].alias("e1"), F.col("e")[1].alias("e2"))
        .withColumn("j", F.lit(1))
    )
    c = F.col("l_extendedprice")
    exact_label = (
        F.when(c <= F.col("e1"), labels[0])
        .when(c <= F.col("e2"), labels[1])
        .otherwise(labels[2])
    )
    agree = (
        approx.withColumn("j", F.lit(1))
        .join(F.broadcast(edges), "j")
        .agg(F.avg((F.col("t_approx") == exact_label).cast("double")).alias("rate"))
        .select((F.col("rate") >= 0.95).alias("ok"))
    )

    # -- FFD packing invariants --------------------------------------
    docs = read_table(spark, "documents", sf_dir)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs")).withColumn("j", F.lit(1))
    ffd = pack_first_fit_decreasing(docs, "lang", "doc_id", "n_chars", 2048)
    per_pack = ffd.groupBy("lang", "pack_id").agg(
        F.sum("n_chars").alias("ps"), F.count(F.lit(1)).alias("nd")
    )
    cap = per_pack.agg(
        F.min(((F.col("ps") <= 2048) | (F.col("nd") == 1)).cast("int")).alias("m")
    ).select((F.col("m") == 1).alias("ok"))
    part = (
        ffd.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_ids"),
        )
        .withColumn("j", F.lit(1))
        .join(F.broadcast(n_docs), "j")
        .select(
            ((F.col("n_rows") == F.col("n_docs")) & (F.col("n_ids") == F.col("n_docs"))).alias("ok")
        )
    )
    nf = pack_next_fit(docs, "lang", "doc_id", "n_chars", 2048)
    ffd_packs = (
        pack_stats(ffd, "lang", "n_chars", 2048)
        .agg(F.sum("n_packs").alias("fp"))
        .withColumn("j", F.lit(1))
    )
    nf_packs = (
        pack_stats(nf, "lang", "n_chars", 2048)
        .agg(F.sum("n_packs").alias("np"))
        .withColumn("j", F.lit(1))
    )
    tighter = ffd_packs.join(nf_packs, "j").select((F.col("fp") <= F.col("np")).alias("ok"))

    # -- embedding generation invariants -----------------------------
    e1 = embed_generate(docs)
    e2 = embed_generate(docs.repartition(7, "doc_id")).select(
        "doc_id", F.col("embedding").alias("embedding2")
    )
    det = (
        e1.join(e2, "doc_id")
        .agg(
            F.min((F.col("embedding") == F.col("embedding2")).cast("int")).alias("m"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .withColumn("j", F.lit(1))
        .join(F.broadcast(n_docs), "j")
        .select(((F.col("m") == 1) & (F.col("n_rows") == F.col("n_docs"))).alias("ok"))
    )
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    unit = e1.select(
        ((norm == 0.0) | (F.abs(norm - 1.0) < 1e-6)).cast("int").alias("u")
    ).agg(F.min("u").alias("m")).select((F.col("m") == 1).alias("ok"))

    return (
        row("quantile_agreement_ge_95", agree)
        .union(row("ffd_capacity", cap))
        .union(row("ffd_partition", part))
        .union(row("ffd_packs_le_next_fit", tighter))
        .union(row("embed_deterministic", det))
        .union(row("embed_unit_norm", unit))
    )


# ---------------------------------------------------------------------
# Packing suites for rotated-out returners (query_defs4 suite contract:
# wrap the singles' registered oracle SQL so both sides stay
# definitionally in sync with the standalone qnames).
# ---------------------------------------------------------------------

_AGG_OLAP_SQL = f"""
SELECT 'rollup' AS kind, l_returnflag AS k1, l_linestatus AS k2,
       CAST(NULL AS INTEGER) AS g, CAST(n AS BIGINT) AS n,
       CAST(NULL AS DOUBLE) AS d
FROM ({ORACLE_SQL["agg_rollup"]}) q_r
UNION ALL
SELECT 'cube', l_returnflag, l_linestatus, CAST(NULL AS INTEGER),
       CAST(n AS BIGINT), CAST(NULL AS DOUBLE)
FROM ({ORACLE_SQL["agg_cube"]}) q_c
UNION ALL
SELECT 'gsets', l_returnflag, l_linestatus, CAST(g_rf AS INTEGER),
       CAST(n AS BIGINT), CAST(NULL AS DOUBLE)
FROM ({ORACLE_SQL["grouping_sets"]}) q_g
UNION ALL
SELECT 'having', CAST(l_suppkey AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS INTEGER), CAST(n_lines AS BIGINT), CAST(sum_qty AS DOUBLE)
FROM ({ORACLE_SQL["agg_having"]}) q_h
"""


@register("agg_olap_suite", _AGG_OLAP_SQL)
def q_agg_olap_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (rollup / cube / grouping sets) + HAVING in one window slot,
    union-normalized to (kind, k1, k2, g, n, d). The singles stay
    registered for targeted debugging."""
    null_s = F.lit(None).cast("string")
    rollup = QUERIES["agg_rollup"](spark, sf_dir).select(
        F.lit("rollup").alias("kind"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.lit(None).cast("int").alias("g"),
        F.col("n").cast("long").alias("n"),
        F.lit(None).cast("double").alias("d"),
    )
    cube = QUERIES["agg_cube"](spark, sf_dir).select(
        F.lit("cube").alias("kind"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.lit(None).cast("int").alias("g"),
        F.col("n").cast("long").alias("n"),
        F.lit(None).cast("double").alias("d"),
    )
    gsets = QUERIES["grouping_sets"](spark, sf_dir).select(
        F.lit("gsets").alias("kind"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        F.col("g_rf").cast("int").alias("g"),
        F.col("n").cast("long").alias("n"),
        F.lit(None).cast("double").alias("d"),
    )
    having = QUERIES["agg_having"](spark, sf_dir).select(
        F.lit("having").alias("kind"),
        F.col("l_suppkey").cast("string").alias("k1"),
        null_s.alias("k2"),
        F.lit(None).cast("int").alias("g"),
        F.col("n_lines").cast("long").alias("n"),
        F.col("sum_qty").cast("double").alias("d"),
    )
    return rollup.union(cube).union(gsets).union(having)


_TEXT_SUITE_SQL = f"""
SELECT 'stats' AS kind, CAST(doc_id AS BIGINT) AS id, lang_pred AS s1, fp AS s2,
       CAST(n_chars_measured AS BIGINT) AS n1, CAST(n_words AS BIGINT) AS n2,
       CAST(n_tokens AS BIGINT) AS n3, CAST(punct_ratio AS DOUBLE) AS d1,
       CAST(quality AS DOUBLE) AS d2, CAST(NULL AS DOUBLE) AS d3
FROM ({ORACLE_SQL["text_stats"]}) q_s
UNION ALL
SELECT 'lang', CAST(NULL AS BIGINT), lang_pred, lang_tagged,
       CAST(n_docs AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM ({ORACLE_SQL["lang_dist"]}) q_l
UNION ALL
SELECT 'vocab', CAST(NULL AS BIGINT), token, CAST(NULL AS VARCHAR),
       CAST(cnt AS BIGINT), CAST(rank AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM ({ORACLE_SQL["vocab_topk"]}) q_v
UNION ALL
SELECT 'rep', CAST(doc_id AS BIGINT), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(n_words AS BIGINT),
       CAST(keep AS BIGINT), CAST(NULL AS BIGINT),
       CAST(dup_word_frac AS DOUBLE), CAST(top_word_frac AS DOUBLE),
       CAST(top_bigram_frac AS DOUBLE)
FROM ({ORACLE_SQL["repetition_stats"]}) q_p
"""


@register("text_suite", _TEXT_SUITE_SQL)
def q_text_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 text analysis in one window slot — text_stats + lang_dist +
    vocab_topk + repetition_stats union-normalized to
    (kind, id, s1, s2, n1, n2, n3, d1, d2, d3, b1)."""
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    stats = QUERIES["text_stats"](spark, sf_dir).select(
        F.lit("stats").alias("kind"),
        F.col("doc_id").cast("long").alias("id"),
        F.col("lang_pred").alias("s1"),
        F.col("fp").alias("s2"),
        F.col("n_chars_measured").cast("long").alias("n1"),
        F.col("n_words").cast("long").alias("n2"),
        F.col("n_tokens").cast("long").alias("n3"),
        F.col("punct_ratio").cast("double").alias("d1"),
        F.col("quality").cast("double").alias("d2"),
        null_d.alias("d3"),
    )
    lang = QUERIES["lang_dist"](spark, sf_dir).select(
        F.lit("lang").alias("kind"),
        null_l.alias("id"),
        F.col("lang_pred").alias("s1"),
        F.col("lang_tagged").alias("s2"),
        F.col("n_docs").cast("long").alias("n1"),
        null_l.alias("n2"),
        null_l.alias("n3"),
        null_d.alias("d1"),
        null_d.alias("d2"),
        null_d.alias("d3"),
    )
    vocab = QUERIES["vocab_topk"](spark, sf_dir).select(
        F.lit("vocab").alias("kind"),
        null_l.alias("id"),
        F.col("token").alias("s1"),
        null_s.alias("s2"),
        F.col("cnt").cast("long").alias("n1"),
        F.col("rank").cast("long").alias("n2"),
        null_l.alias("n3"),
        null_d.alias("d1"),
        null_d.alias("d2"),
        null_d.alias("d3"),
    )
    rep = QUERIES["repetition_stats"](spark, sf_dir).select(
        F.lit("rep").alias("kind"),
        F.col("doc_id").cast("long").alias("id"),
        null_s.alias("s1"),
        null_s.alias("s2"),
        F.col("n_words").cast("long").alias("n1"),
        F.col("keep").cast("long").alias("n2"),
        null_l.alias("n3"),
        F.col("dup_word_frac").cast("double").alias("d1"),
        F.col("top_word_frac").cast("double").alias("d2"),
        F.col("top_bigram_frac").cast("double").alias("d3"),
    )
    return stats.union(lang).union(vocab).union(rep)
