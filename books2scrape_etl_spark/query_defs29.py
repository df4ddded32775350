"""Wave-29 qnames (round 7, third continuation session): burstiness
(Fano factor), maximum drawdown, empirical-CDF probes, and trending
token rank shift — dispersion, risk, distribution-probe and trend
primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..28 sets listed in queries.py.

Engine-parity posture: Fano/CV come from exact BIGINT (n, Σx, Σx²)
over per-day counts — variance numerator n·Σx²−(Σx)² stays integer,
one mirrored division (and one IEEE sqrt for CV) at the end; drawdown
is running-max-minus-current over exact cents with the peak day
resolved by an integer min-filter (no arg_max tie hazard); CDF probes
are pure integer threshold counts; rank shift ranks by exact counts
with the (count DESC, token ASC) total order mirrored as ROW_NUMBER
in both engines.

Scale posture (local[32] today, 1000 executors tomorrow):

- **burstiness**: the fact collapses to |types|·|days| cells
  map-side; the stats rollup is |types| rows.
- **max_drawdown**: daily revenue per segment is a dim-sized frame
  (|segments|·|days|); the running max partitions by segment over
  day-domain-bounded input; the argmin day comes from a broadcast
  join back, not a global sort.
- **cdf_probes**: ONE map-side-combining aggregate — each probe is a
  conditional count column.
- **rank_shift**: one (half, token) shuffle to counts; the rank
  windows partition by half over vocabulary-sized input; the shift
  join is top-k-sized.

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
# burstiness — Fano factor (variance/mean) and CV of daily event
# counts per type: >1 = bursty, ~1 = Poisson-like, <1 = regular.
# ---------------------------------------------------------------------

_BURST_SQL = """
WITH d AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS sx,
         CAST(SUM(c * c) AS BIGINT) AS sxx
  FROM d GROUP BY 1
)
SELECT event_type, n_days, sx AS total_events,
       CAST(n_days * sxx - sx * sx AS BIGINT) AS var_n2,
       CAST(n_days * sxx - sx * sx AS DOUBLE)
         / CAST(n_days * sx AS DOUBLE) AS fano,
       sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)) / CAST(sx AS DOUBLE)
         AS cv
FROM s ORDER BY event_type
"""


@register("burstiness", _BURST_SQL)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness profile of daily event counts per type: Fano factor
    = population variance / mean = (nΣx²−(Σx)²)/(n·Σx) — ONE
    mirrored division of exact BIGINTs (a Poisson process gives ≈1;
    >1 flags bursty feeds that break uniform-partition assumptions) —
    and CV = √(nΣx²−(Σx)²)/Σx (the √n·σ/mean form; sqrt is
    IEEE-correctly-rounded in both engines).

    Scale: the fact collapses map-side to |types|·|days| cells; the
    stats rollup is |types| rows."""
    ev = read_table(spark, "events", sf_dir)
    d = (
        ev.select(
            "event_type", F.expr("CAST(ts AS LONG) DIV 86400").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sxx"),
    )
    var_n2 = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "n_days",
        F.col("sx").alias("total_events"),
        var_n2.cast("bigint").alias("var_n2"),
        (var_n2.cast("double") / (F.col("n_days") * F.col("sx")).cast("double")).alias(
            "fano"
        ),
        (F.sqrt(var_n2.cast("double")) / F.col("sx").cast("double")).alias("cv"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------
# max_drawdown — worst peak-to-trough drop of cumulative-free daily
# revenue per segment (the risk metric, on exact cents).
# ---------------------------------------------------------------------

_DRAWDOWN_SQL = """
WITH o2 AS (
  SELECT o_custkey,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
m AS (
  SELECT c.c_mktsegment, o2.day, CAST(SUM(o2.cents) AS BIGINT) AS rev
  FROM o2 JOIN customer c ON o2.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT c_mktsegment, day, rev,
         max(rev) OVER (PARTITION BY c_mktsegment ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak
  FROM m
),
dd AS (SELECT c_mktsegment, day, peak - rev AS drawdown FROM r),
mx AS (
  SELECT c_mktsegment, CAST(max(drawdown) AS BIGINT) AS max_drawdown_cents
  FROM dd GROUP BY 1
)
SELECT mx.c_mktsegment, mx.max_drawdown_cents,
       CAST(min(dd.day) AS BIGINT) AS trough_day
FROM mx JOIN dd ON mx.c_mktsegment = dd.c_mktsegment
                AND dd.drawdown = mx.max_drawdown_cents
GROUP BY 1, 2 ORDER BY 1
"""


@register("max_drawdown", _DRAWDOWN_SQL)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of daily revenue per segment: running peak
    (rows-unbounded max over the day order) minus current, maxed —
    all on exact cents — plus the trough day, resolved as the MIN day
    attaining the max drawdown via a broadcast join-back (an explicit
    integer tiebreak, immune to the engines' differing arg_max tie
    semantics).

    Scale: daily revenue is a |segments|·|days| dim-sized frame; the
    running max partitions by segment over day-domain-bounded input;
    the trough lookup broadcasts the |segments|-row maxima."""
    o = read_table(spark, "orders", sf_dir)
    c = read_table(spark, "customer", sf_dir)
    m = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_mktsegment",
            F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400").alias(
                "day"
            ),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("c_mktsegment", "day")
        .agg(F.sum("cents").cast("bigint").alias("rev"))
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = m.withColumn("drawdown", F.max("rev").over(w) - F.col("rev"))
    mx = dd.groupBy("c_mktsegment").agg(
        F.max("drawdown").cast("bigint").alias("max_drawdown_cents")
    )
    return (
        dd.join(F.broadcast(mx), "c_mktsegment")
        .filter(F.col("drawdown") == F.col("max_drawdown_cents"))
        .groupBy("c_mktsegment", "max_drawdown_cents")
        .agg(F.min("day").cast("bigint").alias("trough_day"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------
# cdf_probes — empirical CDF of order value at fixed probe thresholds
# per segment (pure integer threshold counts).
# ---------------------------------------------------------------------

_CDF_PROBES_CENTS = (5_000_00, 15_000_00, 30_000_00)  # $5k / $15k / $30k

_CDF_SQL = f"""
WITH o2 AS (
  SELECT c.c_mktsegment,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN cents <= {_CDF_PROBES_CENTS[0]} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_le_5k,
       CAST(SUM(CASE WHEN cents <= {_CDF_PROBES_CENTS[1]} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_le_15k,
       CAST(SUM(CASE WHEN cents <= {_CDF_PROBES_CENTS[2]} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_le_30k,
       CAST(SUM(CASE WHEN cents <= {_CDF_PROBES_CENTS[0]} THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cdf_5k,
       CAST(SUM(CASE WHEN cents <= {_CDF_PROBES_CENTS[1]} THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cdf_15k,
       CAST(SUM(CASE WHEN cents <= {_CDF_PROBES_CENTS[2]} THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cdf_30k
FROM o2 GROUP BY 1 ORDER BY 1
"""


@register("cdf_probes", _CDF_SQL)
def q_cdf_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical CDF of order value probed at fixed thresholds ($5k /
    $15k / $30k) per segment — the monitoring twin of
    group_percentiles (fixed x, read F(x); percentiles fix p, read
    x). Threshold tests are exact integer cent comparisons; shares
    are mirrored divisions. CDF monotonicity across probes is the
    built-in sanity law.

    Scale: ONE map-side-combining aggregate — each probe is a
    conditional-count column, so probe count scales columns, not
    passes."""
    o = read_table(spark, "orders", sf_dir)
    c = read_table(spark, "customer", sf_dir)
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    o2 = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", cents.alias("cents")
    )
    n = F.count(F.lit(1))
    cnt = {
        lbl: F.sum((F.col("cents") <= lim).cast("bigint"))
        for lbl, lim in zip(("5k", "15k", "30k"), _CDF_PROBES_CENTS)
    }
    return (
        o2.groupBy("c_mktsegment")
        .agg(
            n.alias("n"),
            *[cnt[lbl].cast("bigint").alias(f"n_le_{lbl}") for lbl in cnt],
            *[
                (cnt[lbl].cast("double") / n.cast("double")).alias(f"cdf_{lbl}")
                for lbl in cnt
            ],
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------
# rank_shift — trending tokens: frequency rank in the first vs second
# half of the document id range, with the rank delta.
# ---------------------------------------------------------------------

_RANK_SHIFT_K = 20

_RANK_SHIFT_SQL = f"""
WITH b AS (
  SELECT (min(doc_id) + max(doc_id)) // 2 AS mid FROM documents
),
toks AS (
  SELECT CASE WHEN doc_id <= (SELECT mid FROM b) THEN 1 ELSE 2 END AS half,
         unnest(string_split({_NORM_SQL}, ' ')) AS token
  FROM documents
),
t2 AS (SELECT half, token FROM toks WHERE token <> ''),
tc AS (SELECT half, token, CAST(COUNT(*) AS BIGINT) AS c
       FROM t2 GROUP BY 1, 2),
r AS (
  SELECT half, token, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY half ORDER BY c DESC, token)
              AS BIGINT) AS rk
  FROM tc
)
SELECT a.token,
       a.rk AS rank_h1, b2.rk AS rank_h2,
       a.c AS count_h1, b2.c AS count_h2,
       a.rk - b2.rk AS rank_gain
FROM r a JOIN r b2 ON a.token = b2.token AND a.half = 1 AND b2.half = 2
WHERE a.rk <= {_RANK_SHIFT_K} OR b2.rk <= {_RANK_SHIFT_K}
ORDER BY rank_gain DESC, a.token
"""


@register("rank_shift", _RANK_SHIFT_SQL)
def q_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending tokens: frequency rank in the first vs second half of
    the doc-id range (integer midpoint split), reported for tokens in
    either half's top-20, with rank_gain = rank_h1 − rank_h2
    (positive = climbing). Ranks are ROW_NUMBER over the exact
    (count DESC, token ASC) total order in both engines; the output
    order (rank_gain DESC, token) is total.

    Scale: one (half, token) shuffle to counts. Ranks do NOT come
    from a half-partitioned window (2 partitions ⇒ half the
    vocabulary in one task): dense_ids_scale ranks the (half, −count,
    token) total order by range partition + broadcast offsets, and
    per-half ranks are gid − (half's first gid − 1) — bit-identical
    to the oracle's per-half ROW_NUMBER. The top-k filter keeps the
    join and output top-k-sized; tokens in one half only drop out by
    the inner join, BY DEFINITION on both sides."""
    docs = read_table(spark, "documents", sf_dir)
    from books2scrape_etl_spark.operators.scale import dense_ids_scale
    from books2scrape_etl_spark.operators.text import normalize_for_fingerprint

    b = docs.agg(F.expr("(min(doc_id) + max(doc_id)) DIV 2").alias("mid"))
    toks = F.split(normalize_for_fingerprint(F.col("text")), r" ")
    t2 = (
        docs.crossJoin(F.broadcast(b))
        .select(
            F.when(F.col("doc_id") <= F.col("mid"), 1).otherwise(2).alias("half"),
            F.explode(toks).alias("token"),
        )
        .where(F.col("token") != "")
    )
    tc = t2.groupBy("half", "token").agg(F.count(F.lit(1)).alias("c"))
    # per-half ROW_NUMBER over (c DESC, token) WITHOUT a 2-partition
    # window: global dense ids over the (half, -c, token) total order,
    # then subtract each half's offset (its first gid - 1)
    gids = dense_ids_scale(
        tc.select("half", (-F.col("c")).alias("neg_c"), "token"),
        ["half", "neg_c", "token"],
        "gid",
        num_partitions=8,
    ).select("half", (-F.col("neg_c")).alias("c"), "token", "gid")
    offs = gids.groupBy("half").agg((F.min("gid") - 1).alias("off"))
    r = gids.join(F.broadcast(offs), "half").select(
        "half", "token", "c", (F.col("gid") - F.col("off")).cast("bigint").alias("rk")
    )
    a = r.filter(F.col("half") == 1).select(
        "token", F.col("rk").alias("rank_h1"), F.col("c").alias("count_h1")
    )
    b2 = r.filter(F.col("half") == 2).select(
        "token", F.col("rk").alias("rank_h2"), F.col("c").alias("count_h2")
    )
    return (
        a.join(b2, "token")
        .filter(
            (F.col("rank_h1") <= _RANK_SHIFT_K) | (F.col("rank_h2") <= _RANK_SHIFT_K)
        )
        .select(
            "token",
            "rank_h1",
            "rank_h2",
            "count_h1",
            "count_h2",
            (F.col("rank_h1") - F.col("rank_h2")).alias("rank_gain"),
        )
        .orderBy(F.col("rank_gain").desc(), "token")
    )
