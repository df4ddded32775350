"""Wave-22 qnames (round 7, second continuation session): Herfindahl
revenue concentration, Pareto 80% coverage, source n-gram
containment, and per-type anomalous-day detection — concentration,
coverage, contamination-direction and outlier screens.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..21 sets listed in queries.py.

Engine-parity posture: money stays in exact integer cents; HHI's
sufficient statistics are exact BIGINTs over whole-dollar units
(cents DIV 100 — floor division mirrored on both sides; cents²
overflows int64 at sf0.1 already, dollars² holds to ~5e18 with the
usual DECIMAL(38,0) upgrade note beyond); all divisions are mirrored
IEEE ops on correctly-rounded int64→double conversions; sqrt is
IEEE-correctly-rounded in both engines (anomaly z-scores); the Pareto
cut is an EXACT integer comparison (5·cum ≥ 4·total — no 0.8
double); n-gram lists mirror ngram_jaccard's established CASE/range
construction.

Scale posture (local[32] today, 1000 executors tomorrow):

- **hhi_by_segment**: one customer-broadcast join (dim-sized), one
  map-side-combining per-(segment, customer) aggregate, then a
  5-group rollup of exact sufficient statistics.
- **pareto_coverage**: per-customer totals → prefix_sums_scale over
  the (spend DESC, custkey) total order (range partition + driver
  offsets — no single-task window); the cut is a filter + 1-row
  aggregate.
- **ngram_containment**: DISTINCT (source, gram) collapses each feed
  to its gram vocabulary BEFORE the self-join; the join key is the
  gram, so each gram contributes at most |sources-containing-it|
  pairs — never a cross product (the source_overlap shape, made
  DIRECTIONAL: containment |A∩B|/|A| tells which feed is inside
  which).
- **anomaly_days**: the fact collapses to |types|·|days| rows; the
  per-type stats (n, Σx, Σx²) broadcast back to flag outlier days.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

# ---------------------------------------------------------------------
# hhi_by_segment — Herfindahl-Hirschman concentration of customer
# revenue within each market segment, plus the effective number of
# equal-size customers (1/HHI).
# ---------------------------------------------------------------------

_HHI_SQL = """
WITH pc AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) // 100
           AS dollars
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(dollars) AS BIGINT) AS sd,
         CAST(SUM(dollars * dollars) AS BIGINT) AS sdd
  FROM pc GROUP BY 1
)
SELECT c_mktsegment, n_cust, sd AS total_dollars,
       CAST(sdd AS DOUBLE) / (CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) AS hhi,
       (CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) / CAST(sdd AS DOUBLE)
         AS effective_n
FROM s ORDER BY c_mktsegment
"""


@register("hhi_by_segment", _HHI_SQL)
def q_hhi_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market segment: HHI = Σsᵢ² over
    customer revenue shares, computed as Σd²/(Σd)² from two exact
    BIGINT sufficient statistics over whole-dollar units (cents DIV
    100 — dollars² stays in int64 where cents² already overflows at
    sf0.1; DECIMAL(38,0) is the documented upgrade past ~5e18), and
    effective_n = 1/HHI — the "how many equal customers is this
    really" screen. Customer dim broadcasts; one map-side-combining
    aggregate; 5-group rollup."""
    o = read_table(spark, "orders", sf_dir)
    c = read_table(spark, "customer", sf_dir)
    pc = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        # integer DIV (floor for non-negative cents) mirrors DuckDB //
        .withColumn("dollars", F.expr("cents DIV 100"))
    )
    s = pc.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("dollars").alias("sd"),
        F.sum(F.col("dollars") * F.col("dollars")).alias("sdd"),
    )
    sd_d = F.col("sd").cast("double")
    sdd_d = F.col("sdd").cast("double")
    return s.select(
        "c_mktsegment",
        "n_cust",
        F.col("sd").alias("total_dollars"),
        (sdd_d / (sd_d * sd_d)).alias("hhi"),
        ((sd_d * sd_d) / sdd_d).alias("effective_n"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------
# pareto_coverage — the minimum number of top customers covering 80%
# of total revenue (exact integer cut, no doubles in the decision).
# ---------------------------------------------------------------------

_PARETO_SQL = """
WITH pc AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
c AS (
  SELECT cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_cents,
         CAST(row_number() OVER (ORDER BY cents DESC, o_custkey) AS BIGINT) AS rnk
  FROM pc
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS total
  FROM pc
)
SELECT CAST(min(rnk) AS BIGINT) AS n_top, n AS n_customers,
       CAST(min(rnk) AS DOUBLE) / CAST(n AS DOUBLE) AS base_share,
       CAST(arg_min(cum_cents, rnk) AS DOUBLE) / CAST(total AS DOUBLE)
         AS cum_share
FROM c CROSS JOIN t
WHERE 5 * cum_cents >= 4 * total
GROUP BY n, total
"""


@register("pareto_coverage", _PARETO_SQL)
def q_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 summary: minimum number of top-spending customers
    whose cumulative revenue reaches 80% of the total. The cut is the
    EXACT integer comparison 5·cum ≥ 4·total (no 0.8 double); the
    cumulative runs through prefix_sums_scale over the (spend DESC,
    custkey) total order (range partition + driver offsets — no
    single-task window); cum_share at the cut uses min_by/arg_min on
    the BIGINT rank (measured bit-portable)."""
    from books2scrape_etl_spark.operators.scale import prefix_sums_scale

    o = read_table(spark, "orders", sf_dir)
    pc = (
        o.groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .withColumn("neg_cents", -F.col("cents"))
        .withColumn("one", F.lit(1).cast("bigint"))
    )
    c = prefix_sums_scale(pc, ["neg_cents", "o_custkey"], ["cents", "one"]).select(
        F.col("cum_cents"), F.col("cum_one").alias("rnk")
    )
    t = pc.agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total"))
    cut = c.crossJoin(F.broadcast(t)).where(
        F.lit(5) * F.col("cum_cents") >= F.lit(4) * F.col("total")
    )
    return cut.groupBy("n", "total").agg(
        F.min("rnk").alias("n_top"),
        F.min_by("cum_cents", "rnk").alias("cut_cents"),
    ).select(
        F.col("n_top"),
        F.col("n").alias("n_customers"),
        (F.col("n_top").cast("double") / F.col("n").cast("double")).alias(
            "base_share"
        ),
        (F.col("cut_cents").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
    )


# ---------------------------------------------------------------------
# ngram_containment — directional character-3-gram containment
# between source feeds: |grams(A) ∩ grams(B)| / |grams(A)|.
# ---------------------------------------------------------------------

_CONTAIN_SQL = """
WITH grams AS (
  SELECT DISTINCT source, g
  FROM (
    SELECT source, unnest(
      CASE WHEN length(t) < 3 THEN [t]
           ELSE list_distinct([substring(t, i, 3) for i in range(1, length(t) - 1)])
      END) AS g
    FROM (SELECT source, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
          FROM documents)
  )
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM grams GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM grams a JOIN grams b ON a.g = b.g AND a.source <> b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.n_inter, sa.nv AS size_a,
       CAST(i.n_inter AS DOUBLE) / CAST(sa.nv AS DOUBLE) AS containment
FROM inter i JOIN sizes sa ON i.src_a = sa.source
ORDER BY src_a, src_b
"""


@register("ngram_containment", _CONTAIN_SQL)
def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional character-3-gram containment for every ordered
    source pair sharing ≥1 gram: |grams(A)∩grams(B)| / |grams(A)|.
    Unlike symmetric Jaccard (source_overlap), containment → 1 with
    |A| ≪ |B| says feed A is INSIDE feed B — the
    contamination-direction screen. DISTINCT (source, gram) collapses
    each feed to its gram vocabulary before the gram-keyed self-join
    (never a cross product); gram construction mirrors
    ngram_jaccard's CASE/range form; one mirrored division."""
    from books2scrape_etl_spark.operators.text import normalize_for_fingerprint

    docs = read_table(spark, "documents", sf_dir)
    t = normalize_for_fingerprint(F.col("text"))
    g_expr = F.expr(
        "CASE WHEN length(t) < 3 THEN array(t) "
        "ELSE array_distinct(transform(sequence(1, length(t) - 2), "
        "i -> substring(t, i, 3))) END"
    )
    grams = (
        docs.select("source", t.alias("t"))
        .select("source", F.explode(g_expr).alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = grams.select(F.col("source").alias("src_a"), "g")
    b = grams.select(F.col("source").alias("src_b"), "g")
    inter = (
        a.join(b, "g")
        .where(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), "nv")), "src_a"
        )
        .select(
            "src_a",
            "src_b",
            "n_inter",
            F.col("nv").alias("size_a"),
            (F.col("n_inter").cast("double") / F.col("nv").cast("double")).alias(
                "containment"
            ),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------
# anomaly_days — days whose per-type event count sits more than 2
# population standard deviations from the type's mean.
# ---------------------------------------------------------------------

_ANOM_SQL = """
WITH d AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(n) AS BIGINT) AS sn,
         CAST(SUM(n * n) AS BIGINT) AS snn
  FROM d GROUP BY 1
),
z AS (
  SELECT d.event_type, d.day, d.n,
         CAST(sn AS DOUBLE) / CAST(nd AS DOUBLE) AS mean_n,
         (CAST(d.n AS DOUBLE) - (CAST(sn AS DOUBLE) / CAST(nd AS DOUBLE)))
           / sqrt(CAST(nd * snn - sn * sn AS DOUBLE)
                  / (CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE))) AS zscore
  FROM d JOIN s USING (event_type)
  WHERE nd * snn > sn * sn
)
SELECT event_type, day, n, mean_n, zscore
FROM z WHERE zscore > 2 OR zscore < -2
ORDER BY event_type, day
"""


@register("anomaly_days", _ANOM_SQL)
def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly screen: days where a type's event count is more
    than 2 population standard deviations from that type's mean.
    The fact collapses to |types|·|days| rows; per-type (n, Σx, Σx²)
    are exact BIGINTs; mean/σ/z are mirrored IEEE expressions
    (int64→double conversions and sqrt are correctly rounded in both
    engines); the zero-variance guard is the INTEGER comparison
    nd·Σx² > (Σx)²."""
    ev = read_table(spark, "events", sf_dir)
    d = (
        ev.select("event_type", F.expr("CAST(ts AS LONG) DIV 86400").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    mean = F.col("sn").cast("double") / F.col("nd").cast("double")
    var = (F.col("nd") * F.col("snn") - F.col("sn") * F.col("sn")).cast("double") / (
        F.col("nd").cast("double") * F.col("nd").cast("double")
    )
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        d.join(F.broadcast(s), "event_type")
        .where(F.col("nd") * F.col("snn") > F.col("sn") * F.col("sn"))
        .select(
            "event_type",
            "day",
            "n",
            mean.alias("mean_n"),
            z.alias("zscore"),
        )
        .where((F.col("zscore") > 2) | (F.col("zscore") < -2))
        .orderBy("event_type", "day")
    )
