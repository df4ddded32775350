"""Wave-24 qnames (round 7, third continuation session): Spearman
rank correlation, weighted counting quantiles, month-over-month /
year-over-year growth, and per-group deterministic mode — rank
agreement, weighted distribution, calendar growth and categorical
summary primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..23 sets listed in queries.py.

Engine-parity posture: every decision is integer arithmetic. Spearman
needs no doubles until the final mirrored division — row_number ranks
are exact BIGINTs, d² sums are exact, and ρ = (n(n²−1) − 6Σd²) /
(n(n²−1)) is ONE int64→double division per operand (n³ overflows
int64 past n ≈ 3e6 distinct entities — upgrade the two operands to
DECIMAL(38,0) there; documented, not hit at any test SF). Weighted
quantile cuts are the smallest value whose cumulative WEIGHT reaches
p·total, decided by the integer tests 4·cumw ≥ total / 2·cumw ≥
total / 4·cumw ≥ 3·total (quantities are integral in this data
model; the cast is exact). Growth months are pure integer keys
(year·12+month on TZ-free DATE math — epoch-day DIV then day-add
onto the DATE '1970-01-01' literal); growth rates are mirrored
divisions of exact cent differences. Mode ties break on the integer
(count DESC, value ASC) total order, mirrored as ROW_NUMBER in both
engines — never the engines' own mode()/arg_max tie semantics.

Scale posture (local[32] today, 1000 executors tomorrow):

- **rank_correlation**: the fact collapses to one row per customer
  (map-side-combining agg); BOTH global rankings come from
  dense_ids_scale (range partition + local rank + broadcast driver
  offsets — bit-identical to the exact ROW_NUMBER, no single-task
  sort); one custkey-hash join aligns them; the ρ reduce is a 1-row
  aggregate.
- **weighted_quantiles**: the cumulative-weight window runs on the
  per-(group, value) DISTINCT rollup — value-cardinality rows, not
  fact rows (the winsorize posture); totals broadcast.
- **growth_mom_yoy**: the fact collapses to |segments|·|months|
  rows; MoM/YoY alignment is two self-joins on integer month keys
  over that dim-sized frame (gap-correct where lag() would lie), all
  broadcastable.
- **mode_stats**: per-(brand, type) counts are one map-side-combining
  aggregate; the pick window partitions by brand over at most
  |type-domain| rows per brand — key-domain-bounded, invariant in
  fact size.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

# ---------------------------------------------------------------------
# rank_correlation — Spearman's rho between customers' revenue ranking
# and their order-count ranking (do big spenders order most often?).
# ---------------------------------------------------------------------

_SPEARMAN_SQL = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT o_custkey,
         CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT)
           AS rank_rev,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, o_custkey) AS BIGINT)
           AS rank_cnt
  FROM per
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM((rank_rev - rank_cnt) * (rank_rev - rank_cnt)) AS BIGINT)
           AS sum_d2
  FROM r
)
SELECT n, sum_d2,
       CAST(n * (n * n - 1) - 6 * sum_d2 AS DOUBLE)
         / CAST(n * (n * n - 1) AS DOUBLE) AS rho
FROM s
"""


@register("rank_correlation", _SPEARMAN_SQL)
def q_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-customer revenue and
    order count. Ranks are ROW_NUMBER over the (metric DESC, custkey)
    total order — exact BIGINTs, so Σd² is exact and
    ρ = (n(n²−1) − 6Σd²)/(n(n²−1)) is one mirrored int64→double
    division per operand (n·(n²−1) needs DECIMAL(38,0) past ~3e6
    customers — documented upgrade, far past any test SF).

    Scale: the fact collapses to one row per customer; each ranking is
    dense_ids_scale (operators/scale.py — range partition + local rank
    + broadcast offsets, bit-identical to the exact global ROW_NUMBER,
    no single-task sort); one custkey join aligns the two, then a
    1-row reduce."""
    from books2scrape_etl_spark.operators.scale import dense_ids_scale

    o = read_table(spark, "orders", sf_dir)
    per = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )
    # ascending on the negated metric == metric DESC; custkey breaks ties
    by_rev = dense_ids_scale(
        per.select((-F.col("rev")).alias("neg_rev"), "o_custkey"),
        ["neg_rev", "o_custkey"],
        "rank_rev",
        num_partitions=8,
    ).select("o_custkey", "rank_rev")
    by_cnt = dense_ids_scale(
        per.select((-F.col("cnt")).alias("neg_cnt"), "o_custkey"),
        ["neg_cnt", "o_custkey"],
        "rank_cnt",
        num_partitions=8,
    ).select("o_custkey", "rank_cnt")
    d = F.col("rank_rev") - F.col("rank_cnt")
    s = (
        by_rev.join(by_cnt, "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d * d).cast("bigint").alias("sum_d2"),
        )
    )
    denom = F.col("n") * (F.col("n") * F.col("n") - 1)
    return s.select(
        "n",
        "sum_d2",
        (
            (denom - 6 * F.col("sum_d2")).cast("double") / denom.cast("double")
        ).alias("rho"),
    )


# ---------------------------------------------------------------------
# weighted_quantiles — quantity-weighted price quartiles per return
# flag: the cut is the smallest price whose cumulative WEIGHT reaches
# p * total weight (exact counting form, no interpolation).
# ---------------------------------------------------------------------

_WQUANT_SQL = """
WITH cents AS (
  SELECT l_returnflag AS grp,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
vc AS (SELECT grp, v, CAST(SUM(w) AS BIGINT) AS wsum FROM cents GROUP BY 1, 2),
cum AS (
  SELECT grp, v,
         SUM(wsum) OVER (PARTITION BY grp ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw
  FROM vc
),
tot AS (SELECT grp, CAST(SUM(wsum) AS BIGINT) AS total FROM vc GROUP BY 1)
SELECT c.grp AS l_returnflag,
       min(t.total) AS total_weight,
       CAST(min(CASE WHEN 4 * c.cumw >= t.total THEN c.v END) AS BIGINT)
         AS wq25_cents,
       CAST(min(CASE WHEN 2 * c.cumw >= t.total THEN c.v END) AS BIGINT)
         AS wq50_cents,
       CAST(min(CASE WHEN 4 * c.cumw >= 3 * t.total THEN c.v END) AS BIGINT)
         AS wq75_cents
FROM cum c JOIN tot t ON c.grp = t.grp
GROUP BY c.grp ORDER BY c.grp
"""


@register("weighted_quantiles", _WQUANT_SQL)
def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quartiles per return flag: each price
    counts with weight = units sold, and the p-cut is the smallest
    cents value whose cumulative weight reaches p·total — decided by
    the integer tests 4·cumw ≥ total / 2·cumw ≥ total / 4·cumw ≥
    3·total (quantities are integral; CAST is exact). This is the
    token-weighted percentile a corpus pipeline needs ("the doc-length
    median weighted by tokens"), in its exact counting form.

    Scale: the cumulative window runs on the per-(group, value)
    DISTINCT rollup (value-cardinality, not fact-cardinality — the
    winsorize posture); group totals broadcast into the final
    dim-sized pick."""
    li = read_table(spark, "lineitem", sf_dir)
    cents = li.select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    vc = cents.groupBy("grp", "v").agg(F.sum("w").cast("bigint").alias("wsum"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = vc.withColumn("cumw", F.sum("wsum").over(w_cum))
    tot = vc.groupBy("grp").agg(F.sum("wsum").cast("bigint").alias("total"))
    c = cum.join(F.broadcast(tot), "grp")
    return (
        c.groupBy(F.col("grp").alias("l_returnflag"))
        .agg(
            F.min("total").alias("total_weight"),
            F.min(F.when(4 * F.col("cumw") >= F.col("total"), F.col("v")))
            .cast("bigint")
            .alias("wq25_cents"),
            F.min(F.when(2 * F.col("cumw") >= F.col("total"), F.col("v")))
            .cast("bigint")
            .alias("wq50_cents"),
            F.min(F.when(4 * F.col("cumw") >= 3 * F.col("total"), F.col("v")))
            .cast("bigint")
            .alias("wq75_cents"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------
# growth_mom_yoy — monthly revenue per market segment with month-over-
# month and year-over-year growth, aligned by integer month keys (self
# joins, so calendar gaps yield NULL instead of lag()'s wrong neighbor).
# ---------------------------------------------------------------------

_GROWTH_SQL = """
WITH o2 AS (
  SELECT o_custkey, o_totalprice,
         DATE '1970-01-01' + CAST(
           CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS INTEGER
         ) AS dt
  FROM orders
),
m AS (
  SELECT c.c_mktsegment,
         CAST(year(o2.dt) * 12 + month(o2.dt) AS BIGINT) AS ym_idx,
         CAST(SUM(CAST(CAST(o2.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM o2 JOIN customer c ON o2.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT a.c_mktsegment,
       ((a.ym_idx - 1) // 12) * 100 + (a.ym_idx - ((a.ym_idx - 1) // 12) * 12)
         AS ym,
       a.rev_cents,
       CAST(a.rev_cents - p.rev_cents AS DOUBLE)
         / CAST(p.rev_cents AS DOUBLE) AS mom_growth,
       CAST(a.rev_cents - y.rev_cents AS DOUBLE)
         / CAST(y.rev_cents AS DOUBLE) AS yoy_growth
FROM m a
LEFT JOIN m p ON a.c_mktsegment = p.c_mktsegment AND p.ym_idx = a.ym_idx - 1
LEFT JOIN m y ON a.c_mktsegment = y.c_mktsegment AND y.ym_idx = a.ym_idx - 12
ORDER BY a.c_mktsegment, a.ym_idx
"""


@register("growth_mom_yoy", _GROWTH_SQL)
def q_growth_mom_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth per market
    segment. Months are the integer key year·12+month derived by
    TZ-free DATE math (epoch-day DIV 86400, day-added onto the DATE
    '1970-01-01' literal — never a session-TZ-sensitive year(ts));
    MoM/YoY neighbors come from LEFT self-joins on ym_idx−1 / ym_idx−12
    (calendar gaps produce NULL, where lag() would silently compare
    non-adjacent months); growth = mirrored division of exact cent
    BIGINTs. The displayed yyyymm is re-derived from ym_idx by integer
    arithmetic in both engines.

    Scale: the fact collapses through a broadcast customer join into a
    |segments|·|months| frame; both self-joins run on that dim-sized
    table."""
    o = read_table(spark, "orders", sf_dir)
    c = read_table(spark, "customer", sf_dir)
    day = F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
    dt = F.date_add(F.to_date(F.lit("1970-01-01")), day.cast("int"))
    m = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_mktsegment",
            (F.year(dt) * 12 + F.month(dt)).cast("bigint").alias("ym_idx"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("c_mktsegment", "ym_idx")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    a, p, y = m.alias("a"), m.alias("p"), m.alias("y")
    joined = a.join(
        p,
        (F.col("a.c_mktsegment") == F.col("p.c_mktsegment"))
        & (F.col("p.ym_idx") == F.col("a.ym_idx") - 1),
        "left",
    ).join(
        y,
        (F.col("a.c_mktsegment") == F.col("y.c_mktsegment"))
        & (F.col("y.ym_idx") == F.col("a.ym_idx") - 12),
        "left",
    )
    year_part = F.expr("(a.ym_idx - 1) DIV 12")
    return joined.select(
        F.col("a.c_mktsegment").alias("c_mktsegment"),
        (year_part * 100 + (F.col("a.ym_idx") - year_part * 12)).alias("ym"),
        F.col("a.rev_cents").alias("rev_cents"),
        (
            (F.col("a.rev_cents") - F.col("p.rev_cents")).cast("double")
            / F.col("p.rev_cents").cast("double")
        ).alias("mom_growth"),
        (
            (F.col("a.rev_cents") - F.col("y.rev_cents")).cast("double")
            / F.col("y.rev_cents").cast("double")
        ).alias("yoy_growth"),
    ).orderBy("c_mktsegment", "a.ym_idx")


# ---------------------------------------------------------------------
# mode_stats — per-brand modal part type with a DETERMINISTIC tiebreak
# (count DESC, type ASC), mirrored as ROW_NUMBER in both engines.
# ---------------------------------------------------------------------

_MODE_SQL = """
WITH bt AS (
  SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM part GROUP BY 1, 2
),
r AS (
  SELECT p_brand, p_type, cnt,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY cnt DESC, p_type) AS rn,
         CAST(SUM(cnt) OVER (PARTITION BY p_brand) AS BIGINT) AS total,
         CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n_types
  FROM bt
)
SELECT p_brand, p_type AS mode_type, cnt AS mode_count, total, n_types,
       CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS mode_share
FROM r WHERE rn = 1 ORDER BY p_brand
"""


@register("mode_stats", _MODE_SQL)
def q_mode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand modal part type. The pick is ROW_NUMBER over the
    integer (count DESC, type ASC) total order in BOTH engines —
    never the engines' own ``mode()``/``arg_max`` builtins, whose tie
    semantics differ (DuckDB mode returns an arbitrary tied value;
    Spark has no mode over strings pre-3.4 and breaks ties
    differently). mode_share is one mirrored BIGINT→double division.

    Scale: per-(brand, type) counts are one map-side-combining
    aggregate; the pick window partitions by brand over at most
    |type-domain| rows per brand — key-domain-bounded at any fact
    size."""
    p = read_table(spark, "part", sf_dir)
    bt = p.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("cnt"))
    w_pick = Window.partitionBy("p_brand").orderBy(
        F.col("cnt").desc(), F.col("p_type")
    )
    w_all = Window.partitionBy("p_brand")
    r = (
        bt.withColumn("rn", F.row_number().over(w_pick))
        .withColumn("total", F.sum("cnt").over(w_all).cast("bigint"))
        .withColumn("n_types", F.count(F.lit(1)).over(w_all).cast("bigint"))
    )
    return (
        r.filter(F.col("rn") == 1)
        .select(
            "p_brand",
            F.col("p_type").alias("mode_type"),
            F.col("cnt").alias("mode_count"),
            "total",
            "n_types",
            (F.col("cnt").cast("double") / F.col("total").cast("double")).alias(
                "mode_share"
            ),
        )
        .orderBy("p_brand")
    )
