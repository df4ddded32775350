"""Wave-25 qnames (round 7, third continuation session): last-touch
attribution, gaps-and-islands activity streaks, revenue-quintile
transition matrix, and full-outer daily reconciliation — marketing
attribution, engagement-streak, mobility and audit primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..24 sets listed in queries.py.

Engine-parity posture: attribution's carried touch is the LOCF
pattern (``last(col, ignorenulls)`` over ROWS UNBOUNDED PRECEDING ..
1 PRECEDING ≡ DuckDB ``last_value(col IGNORE NULLS)`` — measured
hash-safe, round-7 rules) over the (ts, event_id) integer total
order; money is exact integer cents; streak islands come from the
all-integer day − ROW_NUMBER identity; quintile cuts are counting
quantiles (smallest value with 5·cum ≥ i·n — integer tests); the
reconciliation statuses are derived from NULL-ness of full-outer
sides, materialized as strings and 0-coalesced BIGINTs (no nullable
booleans).

Scale posture (local[32] today, 1000 executors tomorrow):

- **attribution_last_touch**: ONE hash exchange on user_id feeds the
  LOCF window and everything after; the rollup is |touch-types|+1
  rows.
- **streak_islands**: DISTINCT (user, day) bounds each window
  partition by the day-domain, not the event count; the island
  groupBy and the length histogram are map-side-combining.
- **decile_transition**: per-(half, customer) revenue is one
  map-side-combining aggregate; quintile cuts run on the per-(half,
  value) DISTINCT rollup (the winsorize posture) and broadcast back
  (8 rows); the matrix is ≤ 25 cells.
- **reconcile_daily**: both sides collapse to |days| rows BEFORE the
  full-outer join — dim-sized inputs, shuffle-joinable at any fact
  scale.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

_TOUCH_TYPES = ("view", "click")

# ---------------------------------------------------------------------
# attribution_last_touch — each purchase's value goes to the user's
# most recent strictly-earlier touch event (view/click); purchases
# with no prior touch are 'unattributed'.
# ---------------------------------------------------------------------

_ATTRIB_SQL = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         last_value(CASE WHEN event_type IN ('view', 'click')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch
  FROM events
)
SELECT COALESCE(touch, 'unattributed') AS touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS attributed_cents
FROM t WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""


@register("attribution_last_touch", _ATTRIB_SQL)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase's exact-cents value is
    credited to the type of the user's most recent STRICTLY earlier
    touch event (view or click) in the (ts, event_id) total order;
    no prior touch → 'unattributed'. The carried touch is the LOCF
    idiom — ``F.last(..., ignorenulls=True)`` over ROWS UNBOUNDED
    PRECEDING .. 1 PRECEDING, the measured-portable twin of DuckDB's
    ``last_value(... IGNORE NULLS)``.

    Scale: one hash exchange on user_id feeds the window; the final
    rollup is |touch-types|+1 rows."""
    ev = read_table(spark, "events", sf_dir)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_expr = F.when(
        F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type")
    )
    t = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
        F.last(touch_expr, ignorenulls=True).over(w_prev).alias("touch"),
    )
    return (
        t.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("unattributed")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("attributed_cents"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------
# streak_islands — consecutive-active-day streak lengths per user via
# the gaps-and-islands identity, summarized as a length histogram.
# ---------------------------------------------------------------------

_STREAK_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
),
isl AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM ud
),
st AS (
  SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS streak_len
  FROM isl GROUP BY 1, 2
)
SELECT streak_len,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM st GROUP BY 1 ORDER BY 1
"""


@register("streak_islands", _STREAK_SQL)
def q_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day streaks (gaps-and-islands): a user's
    distinct active epoch-days, grouped by the all-integer identity
    island = day − ROW_NUMBER() over (user ORDER BY day) — constant
    exactly while days are consecutive. Output is the streak-length
    histogram (streak count + distinct users reaching that length).

    Scale: DISTINCT (user, day) bounds each window partition by the
    day-domain (not the user's raw event count); island sizing and the
    histogram are map-side-combining aggregates."""
    ev = read_table(spark, "events", sf_dir)
    ud = ev.select(
        "user_id",
        F.expr("CAST(ts AS LONG) DIV 86400").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.withColumn("island", F.col("day") - F.row_number().over(w))
    st = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        st.groupBy("streak_len")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("streak_len")
    )


# ---------------------------------------------------------------------
# decile_transition — customer revenue-quintile mobility between the
# first and second half of the order-date range (counting-quantile
# cuts, 5x5 transition matrix).
# ---------------------------------------------------------------------

_QUINTILE_CUTS_CTE = """
b AS (
  SELECT (min(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
          + max(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)) // 2
           AS mid
  FROM orders
),
pc AS (
  SELECT CASE WHEN CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
              <= (SELECT mid FROM b) THEN 1 ELSE 2 END AS half,
         o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
vc AS (SELECT half, rev, CAST(COUNT(*) AS BIGINT) AS c FROM pc GROUP BY 1, 2),
cum AS (
  SELECT half, rev, c,
         SUM(c) OVER (PARTITION BY half ORDER BY rev
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
         SUM(c) OVER (PARTITION BY half) AS n
  FROM vc
),
cuts AS (
  SELECT half,
         min(CASE WHEN 5 * cm >= 1 * n THEN rev END) AS c1,
         min(CASE WHEN 5 * cm >= 2 * n THEN rev END) AS c2,
         min(CASE WHEN 5 * cm >= 3 * n THEN rev END) AS c3,
         min(CASE WHEN 5 * cm >= 4 * n THEN rev END) AS c4
  FROM cum GROUP BY 1
),
binned AS (
  SELECT pc.half, pc.o_custkey,
         CAST(1 + CASE WHEN pc.rev > k.c1 THEN 1 ELSE 0 END
                + CASE WHEN pc.rev > k.c2 THEN 1 ELSE 0 END
                + CASE WHEN pc.rev > k.c3 THEN 1 ELSE 0 END
                + CASE WHEN pc.rev > k.c4 THEN 1 ELSE 0 END AS BIGINT) AS bin
  FROM pc JOIN cuts k ON pc.half = k.half
)
"""

_TRANSITION_SQL = f"""
WITH {_QUINTILE_CUTS_CTE}
SELECT a.bin AS bin_h1, b2.bin AS bin_h2,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM binned a JOIN binned b2
  ON a.o_custkey = b2.o_custkey AND a.half = 1 AND b2.half = 2
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("decile_transition", _TRANSITION_SQL)
def q_decile_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-quintile mobility: customers are quintile-binned by
    total spend separately in the first and second half of the
    order-date range (midpoint of the epoch-day span, integer DIV);
    the 5×5 matrix counts customers active in BOTH halves per (from,
    to) bin pair. Cuts are counting quantiles — smallest revenue with
    5·cum ≥ i·n, all integer tests — and bin assignment counts cuts
    strictly below the value, so ties bin identically in both engines.

    Scale: per-(half, customer) revenue is one map-side-combining
    aggregate; cut derivation runs on the per-(half, value) DISTINCT
    rollup (winsorize posture); the 8-row cut table broadcasts; the
    matrix is ≤ 25 cells. The self-join aligning halves hashes on
    custkey — dim-sized after the collapse."""
    o = read_table(spark, "orders", sf_dir)
    day = F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
    bounds = o.agg(F.min(day).alias("mn"), F.max(day).alias("mx")).select(
        F.expr("(mn + mx) DIV 2").alias("mid")
    )
    pc = (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.when(day <= F.col("mid"), 1).otherwise(2).alias("half"),
            "o_custkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("half", "o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    vc = pc.groupBy("half", "rev").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("half")
        .orderBy("rev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = vc.groupBy("half").agg(F.sum("c").alias("n"))
    cum = vc.withColumn("cm", F.sum("c").over(w_cum)).join(
        F.broadcast(totals), "half"
    )
    cuts = cum.groupBy("half").agg(
        *[
            F.min(
                F.when(5 * F.col("cm") >= i * F.col("n"), F.col("rev"))
            ).alias(f"c{i}")
            for i in (1, 2, 3, 4)
        ]
    )
    bin_expr = (
        F.lit(1)
        + (F.col("rev") > F.col("c1")).cast("int")
        + (F.col("rev") > F.col("c2")).cast("int")
        + (F.col("rev") > F.col("c3")).cast("int")
        + (F.col("rev") > F.col("c4")).cast("int")
    ).cast("bigint")
    binned = pc.join(F.broadcast(cuts), "half").select(
        "half", "o_custkey", bin_expr.alias("bin")
    )
    h1 = binned.filter(F.col("half") == 1).select(
        "o_custkey", F.col("bin").alias("bin_h1")
    )
    h2 = binned.filter(F.col("half") == 2).select(
        "o_custkey", F.col("bin").alias("bin_h2")
    )
    return (
        h1.join(h2, "o_custkey")
        .groupBy("bin_h1", "bin_h2")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("bin_h1", "bin_h2")
    )


# ---------------------------------------------------------------------
# reconcile_daily — full-outer reconciliation of per-day order counts
# vs per-day event counts (the audit join: which days exist on one
# side only?).
# ---------------------------------------------------------------------

_RECONCILE_SQL = """
WITH od AS (
  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
ed AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT COALESCE(od.day, ed.day) AS day,
       COALESCE(od.n_orders, 0) AS n_orders,
       COALESCE(ed.n_events, 0) AS n_events,
       CASE WHEN od.day IS NULL THEN 'events_only'
            WHEN ed.day IS NULL THEN 'orders_only'
            ELSE 'both' END AS status
FROM od FULL OUTER JOIN ed ON od.day = ed.day
ORDER BY day
"""


@register("reconcile_daily", _RECONCILE_SQL)
def q_reconcile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer daily reconciliation between the orders and events
    feeds: per epoch-day counts from each side, joined FULL OUTER so
    days present on only one side surface with a status tag
    ('orders_only' / 'events_only' / 'both') and 0-coalesced counts —
    the audit query behind every "why don't these two pipelines
    agree?" investigation (J-family completion: the full-outer form).

    Scale: both sides collapse to |days| rows BEFORE the join — the
    full outer runs on two dim-sized inputs at any fact scale."""
    o = read_table(spark, "orders", sf_dir)
    ev = read_table(spark, "events", sf_dir)
    od = (
        o.select(
            F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400").alias(
                "day"
            )
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ed = (
        ev.select(F.expr("CAST(ts AS LONG) DIV 86400").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = od.withColumnRenamed("day", "o_day").join(
        ed.withColumnRenamed("day", "e_day"),
        F.col("o_day") == F.col("e_day"),
        "full_outer",
    )
    return j.select(
        F.coalesce("o_day", "e_day").alias("day"),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.when(F.col("o_day").isNull(), "events_only")
        .when(F.col("e_day").isNull(), "orders_only")
        .otherwise("both")
        .alias("status"),
    ).orderBy("day")
