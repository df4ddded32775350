"""Wave-32 qnames (round 7, third continuation session): functional-
dependency audit and scaled-integer CUSUM change-point detection —
schema-discovery and drift-localization primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..31 sets listed in queries.py.

Engine-parity posture: the FD audit is pure distinct counting; the
CUSUM statistic is the SCALED integer form — with S = Σx and prefix
P_i over the day order, the classic cumulative deviation
P_i − i·(S/n) is multiplied through by n to n·P_i − i·S, so the
whole trajectory (and its argmax) is exact BIGINT arithmetic and no
mean double ever exists; the peak day resolves by an explicit MIN-day
filter join (no arg_max tie hazard).

Scale posture (local[32] today, 1000 executors tomorrow):

- **fd_audit**: one DISTINCT (lhs, rhs) collapse, then a
  map-side-combining per-lhs distinct count — shuffle carries the
  key-domain pairs, never fact rows.
- **change_point**: daily revenue is a |days|-row frame; the prefix
  sums (revenue AND row index) come from ONE prefix_sums_scale pass
  (range partition + broadcast offsets — no single-task window); the
  argmax is a 1-row aggregate joined back for the tiebreak.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

# ---------------------------------------------------------------------
# fd_audit — does the functional dependency LHS -> RHS hold? Profile
# for two candidates: l_partkey -> l_suppkey (expected VIOLATED: parts
# have multiple suppliers) and l_orderkey -> l_returnflag (may hold or
# not — the point is measuring, not assuming).
# ---------------------------------------------------------------------

_FD_SQL = """
WITH ps AS (
  SELECT 'l_partkey->l_suppkey' AS fd, l_partkey AS lhs,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_rhs
  FROM lineitem GROUP BY 2
),
orf AS (
  SELECT 'l_orderkey->l_returnflag' AS fd, l_orderkey AS lhs,
         CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_rhs
  FROM lineitem GROUP BY 2
),
u AS (SELECT * FROM ps UNION ALL SELECT * FROM orf)
SELECT fd,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_keys,
       CAST(max(n_rhs) AS BIGINT) AS max_rhs_cardinality,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS violation_share
FROM u GROUP BY 1 ORDER BY 1
"""


@register("fd_audit", _FD_SQL)
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — the schema-discovery primitive
    behind "can I key on this column?": for each candidate FD
    LHS→RHS, the share of LHS keys mapping to >1 distinct RHS (0 ⟺
    the FD holds). Two candidates profiled: part→supplier (expected
    violated — the multi-supplier fact of this data model) and
    order→returnflag. Pure distinct counting + one mirrored division.

    Scale: DISTINCT-collapse then per-key distinct counts — the
    shuffle carries (lhs, rhs) key pairs, never fact rows; output is
    2 profile rows."""
    li = read_table(spark, "lineitem", sf_dir)

    def profile(fd: str, lhs: str, rhs: str) -> DataFrame:
        per = li.groupBy(F.col(lhs).alias("lhs")).agg(
            F.countDistinct(rhs).alias("n_rhs")
        )
        viol = F.sum((F.col("n_rhs") > 1).cast("bigint"))
        return per.agg(
            F.lit(fd).alias("fd"),
            F.count(F.lit(1)).alias("n_keys"),
            viol.alias("n_violating_keys"),
            F.max("n_rhs").cast("bigint").alias("max_rhs_cardinality"),
            (viol.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "violation_share"
            ),
        )

    return (
        profile("l_partkey->l_suppkey", "l_partkey", "l_suppkey")
        .unionByName(
            profile("l_orderkey->l_returnflag", "l_orderkey", "l_returnflag")
        )
        .orderBy("fd")
    )


# ---------------------------------------------------------------------
# change_point — CUSUM change-point of daily order revenue in the
# SCALED integer form n*P_i - i*S (exact BIGINTs end to end).
# ---------------------------------------------------------------------

_CUSUM_SQL = """
WITH d AS (
  SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev) AS BIGINT) AS s
      FROM d),
c AS (
  SELECT day,
         CAST(SUM(rev) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS p,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
  FROM d
),
st AS (
  SELECT c.day, t.n, t.s,
         abs(t.n * c.p - c.i * t.s) AS stat
  FROM c, t
),
mx AS (SELECT CAST(max(stat) AS BIGINT) AS peak FROM st)
SELECT st.n AS n_days, st.s AS total_cents, mx.peak AS cusum_peak,
       CAST(min(st.day) AS BIGINT) AS cp_day
FROM st, mx WHERE st.stat = mx.peak
GROUP BY st.n, st.s, mx.peak
"""


@register("change_point", _CUSUM_SQL)
def q_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point of daily revenue: the classic cumulative
    deviation P_i − i·μ is multiplied through by n into the SCALED
    form |n·P_i − i·S| — every value on the trajectory is an exact
    BIGINT (no mean double ever exists), so the argmax day is
    bit-deterministic in both engines; ties resolve to the MIN day by
    an explicit filter join. The peak day is the most likely
    level-shift point — the drift localizer run after anomaly_days
    says "something changed".

    Scale: daily revenue is a |days|-row frame; BOTH running
    quantities (revenue prefix and row index) come from ONE
    prefix_sums_scale pass over the day order — no single-task
    window; the argmax is a 1-row broadcast joined back. n·P stays in
    int64 while n·S < 2⁶³ (≈ a century of days at ~$1 B/day cents;
    DECIMAL(38,0) beyond)."""
    from books2scrape_etl_spark.operators.scale import prefix_sums_scale

    o = read_table(spark, "orders", sf_dir)
    d = (
        o.select(
            F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400").alias(
                "day"
            ),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("bigint").alias("rev"))
        .withColumn("one", F.lit(1).cast("bigint"))
    )
    pre = prefix_sums_scale(d, ["day"], ["rev", "one"], num_partitions=8)
    t = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").cast("bigint").alias("s")
    )
    st = pre.crossJoin(F.broadcast(t)).select(
        "day",
        "n",
        "s",
        F.abs(
            F.col("n") * F.col("cum_rev") - F.col("cum_one") * F.col("s")
        ).alias("stat"),
    )
    mx = st.agg(F.max("stat").cast("bigint").alias("peak"))
    return (
        st.crossJoin(F.broadcast(mx))
        .filter(F.col("stat") == F.col("peak"))
        .groupBy(
            F.col("n").alias("n_days"),
            F.col("s").alias("total_cents"),
            F.col("peak").alias("cusum_peak"),
        )
        .agg(F.min("day").cast("bigint").alias("cp_day"))
        .select("n_days", "total_cents", "cusum_peak", "cp_day")
    )
