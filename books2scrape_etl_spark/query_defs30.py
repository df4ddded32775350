"""Wave-30 qnames (round 7, third continuation session): one-pass
deterministic Poisson bootstrap, and quality-keeping deduplication —
resampling-inference and best-survivor primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..29 sets listed in queries.py.

Engine-parity posture: bootstrap replica weights are CASE buckets of
the portable 32-bit md5 hash of (order, replica) against exact
integer thresholds (Poisson(1) cdf · 2³² precomputed in Python and
inlined as literals in BOTH engines — no randomness, no libm at
query time); each replica mean is ONE mirrored division of exact
BIGINT (Σw·cents, Σw); the CI comes from percentile over the B=32
replica means — Spark ``percentile`` ≡ DuckDB ``quantile_cont``
bit-for-bit (measured, round-6 rules) — plus exact min/max order
statistics, so no double is ever SUMMED across rows (double
summation order is engine-dependent; order statistics are not).
dedup_keep_best picks the survivor by the composed integer key
doc_id − n_chars·2³² (arg-min ⇒ max n_chars, then min doc_id — the
single-BIGINT min_by/arg_min pattern from the round-7 rules, with an
in-plan guard that n_chars fits the slot).

Scale posture (local[32] today, 1000 executors tomorrow):

- **bootstrap_se**: the seed explode multiplies the scan by B=32
  but everything collapses map-side to B (replica, Σw·cents, Σw)
  cells; the percentile runs over 32 rows. One pass, no resampled
  copies of the data ever materialize.
- **dedup_keep_best**: same shuffle discipline as dedup_exact — the
  exchange carries (fp, key) pairs, never document text; survivor
  stats collapse to |sources| rows.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

# Poisson(1) cdf at k=0,1,2 scaled to 2^32 (python-precomputed exact
# ints, inlined in both engines): P(0)=.3679, P(<=1)=.7358, P(<=2)=.9197
_POIS_T0, _POIS_T1, _POIS_T2 = 1580030168, 3160060337, 3950075421
_BOOT_B = 32

# ---------------------------------------------------------------------
# bootstrap_se — deterministic one-pass Poisson bootstrap of the mean
# order value: B=32 hash-weighted replicas, CI from replica-mean
# order statistics (never a cross-row double sum).
# ---------------------------------------------------------------------

_BOOT_SQL = f"""
WITH o2 AS (
  SELECT o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT b.b, o2.cents,
         ('0x' || substr(md5(CAST(o2.o_orderkey AS VARCHAR) || ':' ||
                             CAST(b.b AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM o2, LATERAL (
    SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b
  ) b
),
w AS (
  SELECT b, cents,
         CASE WHEN h < {_POIS_T0} THEN 0
              WHEN h < {_POIS_T1} THEN 1
              WHEN h < {_POIS_T2} THEN 2
              ELSE 3 END AS wt
  FROM r
),
m AS (
  SELECT b,
         CAST(SUM(wt) AS BIGINT) AS n_eff,
         CAST(SUM(wt * cents) AS DOUBLE) / CAST(SUM(wt) AS DOUBLE) AS mean_b
  FROM w GROUP BY b
),
fl AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_full
  FROM o2
)
SELECT fl.n, fl.mean_full,
       CAST({_BOOT_B} AS BIGINT) AS n_replicas,
       min(m.mean_b) AS boot_min,
       max(m.mean_b) AS boot_max,
       quantile_cont(m.mean_b, 0.025) AS ci_lo,
       quantile_cont(m.mean_b, 0.975) AS ci_hi
FROM m, fl
GROUP BY fl.n, fl.mean_full
"""


@register("bootstrap_se", _BOOT_SQL)
def q_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass deterministic Poisson bootstrap of the mean order
    value: every (order, replica b<32) pair draws a weight from the
    Poisson(1) pmf via CASE buckets of the portable 32-bit md5 hash
    against python-precomputed integer thresholds — no RNG, no libm,
    reprocessing-stable. Replica means are single mirrored divisions
    of exact BIGINT sums; the 95% CI is ``percentile`` over the 32
    replica means (≡ DuckDB quantile_cont bit-for-bit) with exact
    min/max — deliberately NO variance: summing doubles across rows
    is engine-order-dependent, order statistics are not.

    Scale: the B-way explode collapses map-side to 32 (Σw·c, Σw)
    cells — bootstrap-resampled datasets never materialize. This is
    how a 100 TB pipeline puts an error bar on a metric in one
    scan."""
    o = read_table(spark, "orders", sf_dir)
    o2 = o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    r = o2.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "o_orderkey",
    ).withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("o_orderkey").cast("string"), F.col("b").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    wt = (
        F.when(F.col("h") < _POIS_T0, 0)
        .when(F.col("h") < _POIS_T1, 1)
        .when(F.col("h") < _POIS_T2, 2)
        .otherwise(3)
    )
    m = (
        r.withColumn("wt", wt)
        .groupBy("b")
        .agg(
            F.sum("wt").cast("bigint").alias("n_eff"),
            (
                F.sum(F.col("wt") * F.col("cents")).cast("double")
                / F.sum("wt").cast("double")
            ).alias("mean_b"),
        )
    )
    full = o2.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_full"
        ),
    )
    stats = m.agg(
        F.lit(_BOOT_B).cast("bigint").alias("n_replicas"),
        F.min("mean_b").alias("boot_min"),
        F.max("mean_b").alias("boot_max"),
        F.percentile("mean_b", F.lit(0.025)).alias("ci_lo"),
        F.percentile("mean_b", F.lit(0.975)).alias("ci_hi"),
    )
    return full.crossJoin(F.broadcast(stats)).select(
        "n", "mean_full", "n_replicas", "boot_min", "boot_max", "ci_lo", "ci_hi"
    )


# ---------------------------------------------------------------------
# dedup_keep_best — exact dedup that keeps the HIGHEST-QUALITY copy
# (longest text, then smallest doc_id) instead of dedup_exact's
# min-id survivor.
# ---------------------------------------------------------------------

_KEEP_BEST_SQL = """
WITH fp AS (
  SELECT doc_id, source, n_chars,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
best AS (
  SELECT fp, arg_min(doc_id, doc_id - n_chars * 4294967296) AS keep_id
  FROM fp GROUP BY fp
),
surv AS (
  SELECT f.source, f.n_chars
  FROM fp f JOIN best b ON f.doc_id = b.keep_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_survivors,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
FROM surv GROUP BY 1 ORDER BY 1
"""


@register("dedup_keep_best", _KEEP_BEST_SQL)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the BEST copy per fingerprint — longest
    text first, smallest doc_id on ties — via arg-min of the composed
    integer key doc_id − n_chars·2³² (the single-BIGINT min_by/
    arg_min pattern from the round-7 parity rules; the slot guard
    raises in-plan if n_chars ever exceeds 2³¹, rather than silently
    mis-ranking). The survivor-selection policy is what a training
    corpus actually wants: near-identical crawls collapse to the
    fullest capture. Reported as per-source survivor count + kept
    chars.

    Scale: same discipline as dedup_exact — the exchange carries
    (fp, key) pairs, never text; survivor stats collapse to
    |sources| rows."""
    docs = read_table(spark, "documents", sf_dir)
    from books2scrape_etl_spark.operators.text import normalize_for_fingerprint

    guard = F.when(
        F.col("n_chars") < F.lit(2_147_483_648),
        F.col("doc_id") - F.col("n_chars") * F.lit(4294967296),
    ).otherwise(F.expr("raise_error('n_chars exceeds the composed-key slot')"))
    fp = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(normalize_for_fingerprint(F.col("text"))).alias("fp"),
        guard.alias("rank_key"),
    )
    best = fp.groupBy("fp").agg(F.min_by("doc_id", "rank_key").alias("keep_id"))
    surv = fp.join(
        best, fp["doc_id"] == best["keep_id"]
    ).select("source", "n_chars")
    return (
        surv.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_survivors"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
        .orderBy("source")
    )
