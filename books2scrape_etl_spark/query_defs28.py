"""Wave-28 qnames (round 7, third continuation session): monthly
seasonal indices, per-type Pearson correlation, cumulative adoption
curve, and sweep-line max concurrency — seasonality, dependence,
growth-curve and interval-overlap primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..27 sets listed in queries.py.

Engine-parity posture: the seasonal index multiplies exact cents by
12 BEFORE its single mirrored division; Pearson runs on exact BIGINT
sufficient statistics (discount in integer percent-points, quantity
integral; variance/covariance overflow bounded far past test SFs)
with IEEE-correctly-rounded sqrt on both engines (the anomaly_days
precedent) and an INTEGER zero-variance guard; the adoption curve's
running total is prefix_sums_scale (bit-identical to the exact global
window, no single-task sort); concurrency boundaries order by the
integer (es, delta) key with −1 before +1 at equal seconds, so every
+1 prefix value IS the true instantaneous concurrency and the day
maximum is order-independent.

Scale posture (local[32] today, 1000 executors tomorrow):

- **seasonal_index**: fact collapses through the broadcast customer
  join to |segments|·12 cells in one map-side-combining aggregate.
- **discount_qty_corr**: one broadcast part join + one
  map-side-combining per-type aggregate of six integer statistics.
- **adoption_curve**: first-touch is one map-side aggregate on
  user_id; the day collapse is |days| rows; the running sum is
  range-partition + driver offsets (prefix_sums_scale), never a
  partition-less window.
- **max_concurrency**: sessions (the sessionize_batch construction,
  user-partitioned windows) explode to 2 boundary rows + carry rows
  bounded by span days; the sweep window partitions by DAY — bounded
  by one day's boundary traffic; carry-ins come from a |days|-row
  count, not a per-session scan.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.oracle_shared import SESSION_GAP_S
from books2scrape_etl_spark.registry import register

# ---------------------------------------------------------------------
# seasonal_index — month-of-year revenue seasonality per segment:
# index = 12 * month_share (1.0 = a perfectly flat month).
# ---------------------------------------------------------------------

_SEASONAL_SQL = """
WITH o2 AS (
  SELECT o_custkey,
         CAST(month(DATE '1970-01-01' + CAST(
           CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS INTEGER
         )) AS BIGINT) AS moy,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
m AS (
  SELECT c.c_mktsegment, o2.moy, CAST(SUM(o2.cents) AS BIGINT) AS rev_cents
  FROM o2 JOIN customer c ON o2.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
t AS (SELECT c_mktsegment, CAST(SUM(rev_cents) AS BIGINT) AS total FROM m GROUP BY 1)
SELECT m.c_mktsegment, m.moy, m.rev_cents,
       CAST(12 * m.rev_cents AS DOUBLE) / CAST(t.total AS DOUBLE)
         AS seasonal_index
FROM m JOIN t ON m.c_mktsegment = t.c_mktsegment
ORDER BY m.c_mktsegment, m.moy
"""


@register("seasonal_index", _SEASONAL_SQL)
def q_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality per market segment: index =
    12 · (month revenue / segment revenue), so 1.0 is a perfectly
    flat month and 1.2 a 20% seasonal lift. The cents are multiplied
    by the integer 12 BEFORE the single mirrored division (exact
    numerator, one correctly-rounded int64→double per operand).
    Month-of-year comes from TZ-free DATE math.

    Scale: one broadcast customer join, one map-side-combining
    aggregate to |segments|·12 cells; totals broadcast back."""
    o = read_table(spark, "orders", sf_dir)
    c = read_table(spark, "customer", sf_dir)
    day = F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
    dt = F.date_add(F.to_date(F.lit("1970-01-01")), day.cast("int"))
    m = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_mktsegment",
            F.month(dt).cast("bigint").alias("moy"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("c_mktsegment", "moy")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    t = m.groupBy("c_mktsegment").agg(F.sum("rev_cents").cast("bigint").alias("total"))
    return (
        m.join(F.broadcast(t), "c_mktsegment")
        .select(
            "c_mktsegment",
            "moy",
            "rev_cents",
            (
                (12 * F.col("rev_cents")).cast("double")
                / F.col("total").cast("double")
            ).alias("seasonal_index"),
        )
        .orderBy("c_mktsegment", "moy")
    )


# ---------------------------------------------------------------------
# discount_qty_corr — Pearson correlation between discount depth and
# quantity per part type, from exact integer sufficient statistics.
# ---------------------------------------------------------------------

_CORR_SQL = """
WITH x AS (
  SELECT p.p_type,
         CAST(CAST(l.l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS xb,
         CAST(l.l_quantity AS BIGINT) AS yb
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
s AS (
  SELECT p_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xb) AS BIGINT) AS sx, CAST(SUM(yb) AS BIGINT) AS sy,
         CAST(SUM(xb * yb) AS BIGINT) AS sxy,
         CAST(SUM(xb * xb) AS BIGINT) AS sxx,
         CAST(SUM(yb * yb) AS BIGINT) AS syy
  FROM x GROUP BY 1
)
SELECT p_type, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_n,
       CAST(n * sxx - sx * sx AS BIGINT) AS var_x_n,
       CAST(n * syy - sy * sy AS BIGINT) AS var_y_n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS corr
FROM s ORDER BY p_type
"""


@register("discount_qty_corr", _CORR_SQL)
def q_discount_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between discount depth (integer percent
    points — the 0.01-step discounts are exact under the DECIMAL
    cast) and quantity, per part type. Six exact BIGINT sufficient
    statistics; cov/var numerators stay integer (n·Σxy − ΣxΣy etc. —
    int64-safe to ~1e8 rows/type at these value ranges, DECIMAL(38,0)
    documented beyond); corr is mirrored double ops on
    correctly-rounded conversions (sqrt·sqrt, then ONE division),
    NULL under the INTEGER zero-variance guard.

    Scale: broadcast part join + one map-side-combining per-type
    aggregate; output is |type-domain| rows."""
    li = read_table(spark, "lineitem", sf_dir)
    p = read_table(spark, "part", sf_dir)
    x = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_type",
        (F.col("l_discount").cast("decimal(12,2)") * 100).cast("bigint").alias("xb"),
        F.col("l_quantity").cast("bigint").alias("yb"),
    )
    s = x.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xb").cast("bigint").alias("sx"),
        F.sum("yb").cast("bigint").alias("sy"),
        F.sum(F.col("xb") * F.col("yb")).cast("bigint").alias("sxy"),
        F.sum(F.col("xb") * F.col("xb")).cast("bigint").alias("sxx"),
        F.sum(F.col("yb") * F.col("yb")).cast("bigint").alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "p_type",
        "n",
        cov_n.cast("bigint").alias("cov_n"),
        var_x.cast("bigint").alias("var_x_n"),
        var_y.cast("bigint").alias("var_y_n"),
        F.when(
            (var_x > 0) & (var_y > 0),
            cov_n.cast("double")
            / (F.sqrt(var_x.cast("double")) * F.sqrt(var_y.cast("double"))),
        ).alias("corr"),
    ).orderBy("p_type")


# ---------------------------------------------------------------------
# adoption_curve — daily new users and the cumulative user count (the
# corpus/product growth curve), running total via prefix_sums_scale.
# ---------------------------------------------------------------------

_ADOPTION_SQL = """
WITH f AS (
  SELECT user_id,
         min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS first_day
  FROM events GROUP BY 1
),
d AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM f GROUP BY 1)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM d ORDER BY day
"""


@register("adoption_curve", _ADOPTION_SQL)
def q_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adoption/growth curve: per epoch-day first-seen user counts and
    the cumulative total. The running sum is prefix_sums_scale
    (operators/scale.py — range partition + per-partition cumsum +
    broadcast driver offsets), bit-identical to the exact global
    window the oracle writes, with no single-task sort even when the
    day-domain is huge (think per-minute adoption over years).

    Scale: first-touch is one map-side-combining aggregate on
    user_id; the day collapse is |days| rows; the prefix pass is
    range-partitioned."""
    from books2scrape_etl_spark.operators.scale import prefix_sums_scale

    ev = read_table(spark, "events", sf_dir)
    f = ev.groupBy("user_id").agg(
        F.min(F.expr("CAST(ts AS LONG) DIV 86400")).alias("first_day")
    )
    d = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    out = prefix_sums_scale(d, ["day"], ["new_users"], num_partitions=8)
    return out.select(
        "day", "new_users", F.col("cum_new_users").alias("cum_users")
    ).orderBy("day")


# ---------------------------------------------------------------------
# max_concurrency — sweep-line maximum concurrent sessions per day
# (sessionize_batch sessions; midnight-spanning sessions carry in).
# ---------------------------------------------------------------------

_CONCURRENCY_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
l AS (
  SELECT user_id, event_id, es,
         lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS prev_es
  FROM e
),
f AS (
  SELECT user_id, es,
         CAST(CASE WHEN prev_es IS NULL OR es - prev_es > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS BIGINT) AS is_new,
         event_id
  FROM l
),
s AS (
  SELECT user_id, es,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM f
),
sess AS (
  SELECT user_id, session_id, min(es) AS start_es, max(es) AS end_es
  FROM s GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, session_id, start_es AS es, CAST(1 AS BIGINT) AS delta
  FROM sess
  UNION ALL
  SELECT user_id, session_id, end_es + 1 AS es, CAST(-1 AS BIGINT) AS delta
  FROM sess WHERE (end_es + 1) % 86400 <> 0
),
carry AS (
  SELECT d.day, CAST(COUNT(*) AS BIGINT) AS carry_in
  FROM sess, LATERAL (
    SELECT unnest(generate_series(start_es // 86400 + 1, end_es // 86400))
      AS day
  ) d
  GROUP BY 1
),
run AS (
  SELECT es // 86400 AS day,
         sum(delta) OVER (PARTITION BY es // 86400
                          ORDER BY es, delta, user_id, session_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM bounds
),
mx AS (SELECT day, CAST(max(cum) AS BIGINT) AS max_cum FROM run GROUP BY 1)
SELECT COALESCE(mx.day, c.day) AS day,
       CAST(COALESCE(c.carry_in, 0) AS BIGINT) AS carry_in,
       CAST(COALESCE(c.carry_in, 0)
            + CASE WHEN COALESCE(mx.max_cum, 0) > 0 THEN mx.max_cum ELSE 0 END
         AS BIGINT) AS max_concurrent
FROM mx FULL OUTER JOIN carry c ON mx.day = c.day
ORDER BY 1
"""


@register("max_concurrency", _CONCURRENCY_SQL)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum concurrent sessions per epoch-day, over the
    sessionize_batch session construction (same 21600s gap rule).
    Each session contributes +1 at start_es and −1 at end_es+1
    (active on the inclusive [start, end] second range); within a day
    the boundaries order by the integer (es, delta) key with −1
    BEFORE +1 at equal seconds, so every +1 prefix value equals the
    true instantaneous concurrency and the max is order-independent.
    Sessions spanning midnight are carried into each covered day via
    an exploded day-range count, so day d's sweep starts at its true
    baseline, not zero. Two day-boundary rules keep that exact: a -1
    landing exactly on a day boundary is suppressed (the session never
    occupies that day, and the per-day sweep already restarts), and
    the output day frame is the FULL OUTER join of boundary days with
    carry days (a day fully inside a long session has no boundary
    rows of its own).

    Scale: the sweep window partitions by DAY — bounded by one day's
    boundary traffic; carry-ins are a |days|-row aggregate; sessions
    come from user-partitioned windows (lint-clean)."""
    ev = read_table(spark, "events", sf_dir).select(
        "user_id", "event_id", F.col("ts").cast("long").alias("es")
    )
    w_u = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = ev.withColumn(
        "is_new",
        (
            F.lag("es").over(w_u).isNull()
            | (F.col("es") - F.lag("es").over(w_u) > SESSION_GAP_S)
        ).cast("bigint"),
    )
    s = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sess = s.groupBy("user_id", "session_id").agg(
        F.min("es").alias("start_es"), F.max("es").alias("end_es")
    )
    bounds = sess.select(
        "user_id",
        "session_id",
        F.col("start_es").alias("es"),
        F.lit(1).cast("bigint").alias("delta"),
    ).unionByName(
        # A -1 landing exactly on a day boundary ((end_es+1) % 86400 == 0)
        # belongs to a day the session never occupies — the per-day sweep
        # restarts there anyway, so emitting it would deflate that whole
        # day's prefix by one. Suppress it.
        sess.where((F.col("end_es") + 1) % 86400 != 0).select(
            "user_id",
            "session_id",
            (F.col("end_es") + 1).alias("es"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    start_day = F.expr("start_es DIV 86400")
    end_day = F.expr("end_es DIV 86400")
    carry = (
        sess.select(
            F.explode(
                F.when(
                    end_day > start_day, F.sequence(start_day + 1, end_day)
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("carry_in"))
    )
    w_day = (
        Window.partitionBy(F.expr("es DIV 86400"))
        .orderBy("es", "delta", "user_id", "session_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = bounds.select(
        F.expr("es DIV 86400").alias("day"),
        F.sum("delta").over(w_day).alias("cum"),
    )
    mx = run.groupBy("day").agg(F.max("cum").cast("bigint").alias("max_cum"))
    # Full outer: a day fully inside a midnight-spanning session has
    # carry_in > 0 but no boundary rows, so it exists only in `carry`.
    return (
        mx.join(carry, "day", "full")
        .select(
            "day",
            F.coalesce("carry_in", F.lit(0)).cast("bigint").alias("carry_in"),
            (
                F.coalesce("carry_in", F.lit(0))
                + F.greatest(F.coalesce("max_cum", F.lit(0)), F.lit(0))
            )
            .cast("bigint")
            .alias("max_concurrent"),
        )
        .orderBy("day")
    )
