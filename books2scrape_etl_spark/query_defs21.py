"""Wave-21 qnames (round 7, second continuation session): shipping
delay by priority, inter-arrival gap statistics, exact-duplicate rate
by source, and a day-of-week activity profile — the operational-SLA,
cadence, feed-quality and seasonality screens.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..20 sets listed in queries.py.

Engine-parity posture: all time arithmetic is integer epoch
seconds/days (the round-7 rule: Spark ``CAST(ts AS LONG)`` ≡ DuckDB
``CAST(floor(epoch(ts)) AS BIGINT)``, NTZ columns routed through
``CAST(... AS TIMESTAMP)`` under the UTC session); day-of-week is
pure modular arithmetic on the epoch day (NO dayofweek() — the
engines disagree on week origin); percentiles are the measured
bit-portable percentile ≡ quantile_cont pair; every other compared
double is a mirrored BIGINT ratio; duplicate fingerprints reuse the
md5(normalized) contract of dedup_exact (md5 is md5 in both engines).

Scale posture (local[32] today, 1000 executors tomorrow):

- **ship_delay**: lineitem joins orders on l_orderkey — the classic
  big-big sort-merge (bucketing/bucketed-join is the documented
  co-location route); the per-priority rollup is 5 groups.
- **interarrival_stats**: gaps are computed WITHIN (event_type,
  epoch-day) partitions — bounded window partitions at any scale (a
  per-type global sort would funnel a whole type through one task).
  The ≤1 midnight-crossing gap per day is excluded BY DEFINITION on
  both sides (documented, oracle mirrors the same partitioning).
- **dup_rate_by_source**: shuffles (source, 32-byte fp) pairs only;
  COUNT(DISTINCT fp) per source is Spark's standard partial-distinct
  expansion over the already-collapsed pairs.
- **dow_profile**: collapses to ≤ 7·|types| rows in one map-side-
  combining aggregate; type totals broadcast back.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register
from books2scrape_etl_spark.query_defs import _NORM_SQL

# ---------------------------------------------------------------------
# ship_delay — days between order date and line-item ship date,
# summarized per order priority.
# ---------------------------------------------------------------------

_SHIP_SQL = """
WITH d AS (
  SELECT o.o_orderpriority,
         CAST(floor(epoch(l.l_shipdate)) AS BIGINT) // 86400
           - CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400 AS delay_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       quantile_cont(delay_days, 0.5) AS p50_days,
       quantile_cont(delay_days, 0.9) AS p90_days,
       CAST(max(delay_days) AS BIGINT) AS max_days,
       CAST(SUM(delay_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_days
FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register("ship_delay", _SHIP_SQL)
def q_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency in whole epoch days, summarized per
    order priority (count, p50/p90 via the bit-portable percentile ≡
    quantile_cont pair, exact max, mean as one mirrored BIGINT
    division) — the operational-SLA screen. The lineitem-orders join
    is the canonical big-big sort-merge on orderkey."""
    li = read_table(spark, "lineitem", sf_dir)
    o = read_table(spark, "orders", sf_dir)
    ship_day = F.expr("CAST(CAST(l_shipdate AS TIMESTAMP) AS LONG) DIV 86400")
    order_day = F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
    d = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority", (ship_day - order_day).alias("delay_days")
    )
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr("percentile(delay_days, 0.5)").alias("p50_days"),
            F.expr("percentile(delay_days, 0.9)").alias("p90_days"),
            F.max("delay_days").alias("max_days"),
            (
                F.sum("delay_days").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_days"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------
# interarrival_stats — per-type gap statistics between consecutive
# events, windowed WITHIN (event_type, epoch-day) partitions.
# ---------------------------------------------------------------------

_GAP_SQL = """
WITH e AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id
  FROM events
),
g AS (
  SELECT event_type,
         es - lag(es) OVER (PARTITION BY event_type, day
                            ORDER BY es, event_id) AS gap_s
  FROM e
)
SELECT event_type,
       CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
       quantile_cont(gap_s, 0.5) AS p50_s,
       quantile_cont(gap_s, 0.9) AS p90_s,
       CAST(max(gap_s) AS BIGINT) AS max_s,
       CAST(SUM(gap_s) AS DOUBLE) / CAST(COUNT(gap_s) AS DOUBLE) AS mean_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


@register("interarrival_stats", _GAP_SQL)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics (seconds) between consecutive
    same-type events — the cadence/burstiness screen. Gaps are lagged
    WITHIN (event_type, epoch-day) partitions so window partitions
    stay bounded at any scale (the one midnight-crossing gap per day
    is excluded by definition, mirrored in the oracle). Epoch-second
    BIGINT differences; p50/p90 via the bit-portable percentile pair;
    mean as one mirrored division."""
    ev = read_table(spark, "events", sf_dir)
    e = ev.select(
        "event_type",
        F.expr("CAST(ts AS LONG) DIV 86400").alias("day"),
        F.expr("CAST(ts AS LONG)").alias("es"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "day").orderBy("es", "event_id")
    g = e.select(
        "event_type", (F.col("es") - F.lag("es").over(w)).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.expr("percentile(gap_s, 0.5)").alias("p50_s"),
            F.expr("percentile(gap_s, 0.9)").alias("p90_s"),
            F.max("gap_s").alias("max_s"),
            (F.sum("gap_s").cast("double") / F.count("gap_s").cast("double")).alias(
                "mean_s"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# dup_rate_by_source — exact-duplicate share per feed, on the
# dedup_exact fingerprint contract.
# ---------------------------------------------------------------------

_DUP_SQL = f"""
WITH fp AS (
  SELECT source, md5({_NORM_SQL}) AS fp FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dups,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_rate
FROM fp GROUP BY source ORDER BY source
"""


@register("dup_rate_by_source", _DUP_SQL)
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source feed — the feed-quality gate
    that decides which upstream gets a dedup pass first. Fingerprints
    reuse dedup_exact's md5(normalized-text) contract; the shuffle
    carries (source, 32-byte fp) pairs, never text. dup_rate is one
    mirrored BIGINT division."""
    from books2scrape_etl_spark.operators.text import fingerprint

    docs = read_table(spark, "documents", sf_dir)
    fp = docs.select("source", fingerprint(F.col("text")).alias("fp"))
    return (
        fp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_dups"),
            (
                (F.count(F.lit(1)) - F.countDistinct("fp")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------
# dow_profile — ISO day-of-week x event-type activity profile via
# modular epoch-day arithmetic (no engine dayofweek()).
# ---------------------------------------------------------------------

_DOW_SQL = """
WITH e AS (
  SELECT event_type,
         ((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7) + 1 AS dow_iso
  FROM events
),
c AS (
  SELECT event_type, dow_iso, CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1)
SELECT c.event_type, c.dow_iso, c.n,
       CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
       CAST(c.n * 7 AS DOUBLE) / CAST(t.total AS DOUBLE) AS lift_vs_uniform
FROM c JOIN t USING (event_type)
ORDER BY event_type, dow_iso
"""


@register("dow_profile", _DOW_SQL)
def q_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week activity profile per event type (share of the
    type's events per ISO weekday, and the lift vs a uniform week).
    dow = ((epoch_day + 3) mod 7) + 1 — pure integer arithmetic
    anchored on 1970-01-01 being a Thursday (ISO 4), because the
    engines' dayofweek() builtins disagree on week origin. Collapses
    to ≤ 7·|types| rows map-side; type totals broadcast back; shares
    are mirrored BIGINT divisions."""
    ev = read_table(spark, "events", sf_dir)
    e = ev.select(
        "event_type",
        (((F.expr("CAST(ts AS LONG) DIV 86400") + 3) % 7) + 1).alias("dow_iso"),
    )
    c = e.groupBy("event_type", "dow_iso").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (
        c.join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "dow_iso",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
            (
                (F.col("n") * 7).cast("double") / F.col("total").cast("double")
            ).alias("lift_vs_uniform"),
        )
        .orderBy("event_type", "dow_iso")
    )
