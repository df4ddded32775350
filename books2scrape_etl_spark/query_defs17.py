"""Wave-17 qnames (round 7, continuation session): shuffle-bounded
per-group top-k, centered moving-average trend decomposition, and the
Lorenz concentration curve with an exact Gini coefficient.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..16 sets listed in queries.py.

Engine-parity posture: every compared double is a mirrored ratio of
exact BIGINTs (no libm anywhere); ordering ties always carry a unique
tiebreak key so cuts and ranks are total-order deterministic.

Scale posture (local[32] today, 1000 executors tomorrow):

- **topk_groups_scale**: the two-phase partial top-k
  (operators/scale.py:topk_per_group_scale) bounds the shuffle at
  k rows per (input partition, group) — the window form would shuffle
  every per-user row into its group's partition. The oracle IS the
  window form: bit-identical under the same DESC total order.
- **ts_trend**: the fact collapses to |types|·|days| counts before
  any window; the centered frame runs PARTITIONED by type.
- **lorenz_deciles**: per-customer totals → prefix_sums_scale (range
  partition + driver offsets; no single-task window) → decile index
  by integer arithmetic on the cumulative count (no ntile window);
  Gini from two exact-BIGINT aggregates. At extreme row counts the
  BIGINT products (rank·cents) would upgrade to DECIMAL(38,0) — the
  documented headroom note, not a semantic change.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief (corpus curation ranks
per-group candidates at bounded memory; trend/concentration profiles
are standard dataset-drift and -balance screens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

# ---------------------------------------------------------------------
# topk_groups_scale — top-5 users by exact spend within each
# event_type, via the two-phase partial top-k. Oracle: the plain
# window-rank formulation (identical DESC total order).
# ---------------------------------------------------------------------

_TOPK_K = 5

_TOPK_SQL = f"""
WITH pc AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, user_id, cents,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY cents DESC, user_id DESC
         ) AS BIGINT) AS rank
  FROM pc
)
SELECT event_type, rank, cents, user_id
FROM r WHERE rank <= {_TOPK_K} ORDER BY event_type, rank
"""


@register("topk_groups_scale", _TOPK_SQL)
def q_topk_groups_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 users by total spend per event_type WITHOUT a per-group
    window over all users: local top-k inside each input partition,
    then a global merge of the ≤ k-per-partition candidates
    (operators/scale.py:topk_per_group_scale). The shuffle carries at
    most k rows per (partition, group) — the property that survives a
    billion-user group. (cents DESC, user_id DESC) is a total order,
    so the result is bit-identical to the oracle's window form."""
    from books2scrape_etl_spark.operators.scale import topk_per_group_scale

    ev = read_table(spark, "events", sf_dir)
    pc = ev.groupBy("event_type", "user_id").agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    top = topk_per_group_scale(pc, ["event_type"], ["cents", "user_id"], _TOPK_K)
    return top.select("event_type", "rank", "cents", "user_id").orderBy(
        "event_type", "rank"
    )


# ---------------------------------------------------------------------
# ts_trend — centered 7-day moving-average trend + residual of the
# per-type daily event counts (the moving-average half of an STL-style
# decomposition, kept libm-free).
# ---------------------------------------------------------------------

_TS_TREND_SQL = """
WITH d AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, n,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS sn,
         CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS cn
  FROM d
)
SELECT event_type, day, n,
       CAST(sn AS DOUBLE) / CAST(cn AS DOUBLE) AS trend,
       CAST(n AS DOUBLE) - (CAST(sn AS DOUBLE) / CAST(cn AS DOUBLE)) AS residual
FROM w
"""


@register("ts_trend", _TS_TREND_SQL)
def q_ts_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered +/-3-day moving-average trend of per-type daily counts,
    with the residual (observed - trend). Edge days average over the
    frame rows that exist — the engines' shared ROWS-frame semantics,
    so the BIGINT (sum, count) pair and therefore the mirrored
    double ratio agree bit-for-bit.

    Scale: the fact collapses to |types|*|days| rows in one map-side-
    combining aggregate; the centered window is PARTITIONED by type
    over those collapsed rows."""
    ev = read_table(spark, "events", sf_dir)
    d = (
        ev.select("event_type", F.expr("CAST(ts AS LONG) DIV 86400").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    base = d.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("sn"),
        F.count(F.lit(1)).over(w).alias("cn"),
    )
    trend = F.col("sn").cast("double") / F.col("cn").cast("double")
    return base.select(
        "event_type",
        "day",
        "n",
        trend.alias("trend"),
        (F.col("n").cast("double") - trend).alias("residual"),
    )


# ---------------------------------------------------------------------
# lorenz_deciles — revenue-concentration (Lorenz) curve by customer
# decile plus the exact Gini coefficient, with the cumulative sums
# routed through prefix_sums_scale (no global window, no ntile).
# ---------------------------------------------------------------------

_LORENZ_SQL = """
WITH pc AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
c AS (
  SELECT o_custkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents, o_custkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
         CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rnk
  FROM pc
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         CAST(SUM(rnk * cents) AS BIGINT) AS s_rx
  FROM c
),
dec AS (
  SELECT ((rnk - 1) * 10) // n + 1 AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_cust,
         max(rnk) AS cum_n,
         max(cum_cents) AS cum_cents
  FROM c CROSS JOIN t GROUP BY 1
)
SELECT decile, n_cust,
       CAST(cum_n AS DOUBLE) / CAST(n AS DOUBLE) AS cust_share,
       CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS spend_share,
       (CAST(2 * s_rx AS DOUBLE) / CAST(n * total_cents AS DOUBLE))
         - (CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)) AS gini
FROM dec CROSS JOIN t ORDER BY decile
"""


@register("lorenz_deciles", _LORENZ_SQL)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend by decile (cumulative customer
    share vs cumulative spend share at each decile boundary) plus the
    exact Gini G = 2*sum(rank*x)/(n*sum(x)) - (n+1)/n — the standard
    revenue-concentration / dataset-balance screen.

    Plan shape: per-customer exact-cents totals (one map-side-
    combining aggregate) -> prefix_sums_scale over the (cents,
    custkey) total order for BOTH the cumulative spend and the rank
    (integer addition: bit-identical to the oracle's global window) ->
    decile index by integer arithmetic on the rank (NO ntile window)
    -> 10-row rollup. Gini's sums stay in exact BIGINTs (overflow
    headroom to ~1e18; DECIMAL(38,0) is the documented upgrade).
    """
    from books2scrape_etl_spark.operators.scale import prefix_sums_scale

    o = read_table(spark, "orders", sf_dir)
    pc = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    ).withColumn("one", F.lit(1).cast("bigint"))
    c = prefix_sums_scale(pc, ["cents", "o_custkey"], ["cents", "one"]).select(
        "o_custkey",
        "cents",
        F.col("cum_cents"),
        F.col("cum_one").alias("rnk"),
    )
    t = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("rnk") * F.col("cents")).alias("s_rx"),
    )
    dec = (
        c.crossJoin(F.broadcast(t))
        .groupBy(F.expr("((rnk - 1) * 10) DIV n").alias("decile_0"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.max("rnk").alias("cum_n"),
            F.max("cum_cents").alias("cum_cents"),
        )
        .withColumn("decile", F.col("decile_0") + 1)
        .drop("decile_0")
    )
    gini = (
        (F.lit(2) * F.col("s_rx")).cast("double")
        / (F.col("n") * F.col("total_cents")).cast("double")
    ) - ((F.col("n") + 1).cast("double") / F.col("n").cast("double"))
    return (
        dec.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n_cust",
            (F.col("cum_n").cast("double") / F.col("n").cast("double")).alias(
                "cust_share"
            ),
            (
                F.col("cum_cents").cast("double")
                / F.col("total_cents").cast("double")
            ).alias("spend_share"),
            gini.alias("gini"),
        )
        .orderBy("decile")
    )
