"""Wave-20 qnames (round 7, second continuation session): per-source
distinctive terms, rolling OLS trend slope, funnel stage latencies,
and a join-key skew profiler — corpus-drift, trend, product-latency
and pre-shuffle diagnostics.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..19 sets listed in queries.py.

Engine-parity posture: counts and frame sums are exact BIGINTs;
every compared double is either a mirrored BIGINT ratio or Spark
``percentile`` ≡ DuckDB ``quantile_cont`` (measured bit-portable,
round-6 rule); lift RANKING uses the raw frequency ratio — no
logarithm anywhere (the pmi_collocations rule: a ratio is monotone in
its log, so ordering is identical without libm).

Scale posture (local[32] today, 1000 executors tomorrow):

- **distinctive_terms**: one shuffle to (source, token) counts (map-
  side combining after the explode), a token-keyed shuffle join
  against the corpus token totals, the |sources|-row and 1-row
  totals broadcast; the per-source top-k window runs over the
  already-collapsed (source, token) rows.
- **rolling_slope**: the fact collapses to |types|·|days| rows before
  any window; all five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
  share ONE ±3-row frame partitioned by type — Catalyst evaluates
  them in a single WindowExec pass.
- **funnel_latency**: identical single-exchange shape as
  funnel_conversion (same user_id partitioning for both chained
  "strictly-before" window passes and the per-user rollup); the
  percentile aggregate runs over ≤ one row per user.
- **skew_profile**: per-key counts are map-side-combining aggregates;
  the skew statistics then aggregate |keys| count rows — the exact
  diagnostic a planner consults before choosing broadcast vs
  salting vs AQE skew-join on a 100 TB fact.

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
# distinctive_terms — top-10 tokens per source by frequency lift
# (share in source / share in corpus), min-count floor 5.
# ---------------------------------------------------------------------

_DT_MIN_COUNT = 5
_DT_TOPK = 10

_DT_SQL = f"""
WITH tok AS (
  SELECT source, w
  FROM (SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents)
  WHERE w <> ''
),
st AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_st
  FROM tok GROUP BY 1, 2
),
s AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s FROM st GROUP BY 1),
t AS (SELECT w, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS t_all FROM st),
scored AS (
  SELECT st.source, st.w, st.c_st,
         CAST(st.c_st * t_all AS DOUBLE) / CAST(s.t_s * t.c_t AS DOUBLE) AS lift
  FROM st
  JOIN s USING (source)
  JOIN t USING (w)
  CROSS JOIN tot
  WHERE st.c_st >= {_DT_MIN_COUNT}
),
r AS (
  SELECT source, w AS token, c_st, lift,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY lift DESC, w ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT source, rank, token, c_st, lift
FROM r WHERE rank <= {_DT_TOPK} ORDER BY source, rank
"""


@register("distinctive_terms", _DT_SQL)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 distinctive tokens per source, ranked by frequency lift
    (c_st/T_s) / (c_t/T) — rearranged to the all-integer cross product
    (c_st*T) / (T_s*c_t) so the score is ONE mirrored BIGINT division
    (no logarithm; the log-lift would rank identically). Tokens below
    5 occurrences in a source are floored out; ties break on the
    token string, so the per-source rank is total-order
    deterministic — the corpus-drift screen that surfaces what a feed
    talks about relative to the whole corpus."""
    from books2scrape_etl_spark.operators.text import normalize_for_fingerprint

    docs = read_table(spark, "documents", sf_dir)
    tok = docs.select(
        "source",
        F.explode(F.split(normalize_for_fingerprint(F.col("text")), " ")).alias("w"),
    ).where(F.col("w") != "")
    st = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_st"))
    s = st.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    t = st.groupBy("w").agg(F.sum("c_st").alias("c_t"))
    tot = st.agg(F.sum("c_st").alias("t_all"))
    scored = (
        st.where(F.col("c_st") >= _DT_MIN_COUNT)
        .join(F.broadcast(s), "source")
        .join(t, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "w",
            "c_st",
            (
                (F.col("c_st") * F.col("t_all")).cast("double")
                / (F.col("t_s") * F.col("c_t")).cast("double")
            ).alias("lift"),
        )
    )
    wr = Window.partitionBy("source").orderBy(F.col("lift").desc(), F.col("w").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .where(F.col("rank") <= _DT_TOPK)
        .select("source", "rank", F.col("w").alias("token"), "c_st", "lift")
        .orderBy("source", "rank")
    )


# ---------------------------------------------------------------------
# rolling_slope — ±3-day rolling OLS trend slope of per-type daily
# event counts from the five windowed sufficient statistics.
# ---------------------------------------------------------------------

_SLOPE_SQL = """
WITH d AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, n,
         CAST(COUNT(*) OVER fr AS BIGINT) AS cn,
         CAST(SUM(day) OVER fr AS BIGINT) AS sx,
         CAST(SUM(n) OVER fr AS BIGINT) AS sy,
         CAST(SUM(day * n) OVER fr AS BIGINT) AS sxy,
         CAST(SUM(day * day) OVER fr AS BIGINT) AS sxx
  FROM d
  WINDOW fr AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
)
SELECT event_type, day, n,
       CASE WHEN cn * sxx - sx * sx = 0 THEN NULL
            ELSE CAST(cn * sxy - sx * sy AS DOUBLE)
                 / CAST(cn * sxx - sx * sx AS DOUBLE) END AS slope
FROM w
"""


@register("rolling_slope", _SLOPE_SQL)
def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±3-day rolling OLS trend slope of per-type daily counts:
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) computed from five exact
    BIGINT sufficient statistics sharing ONE ROWS frame (single
    WindowExec pass), then one mirrored double division — the
    windowed sibling of grouped_regression's closed-form OLS.
    Degenerate frames (a single distinct day) yield NULL on both
    sides."""
    ev = read_table(spark, "events", sf_dir)
    d = (
        ev.select("event_type", F.expr("CAST(ts AS LONG) DIV 86400").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fr = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    w = d.select(
        "event_type",
        "day",
        "n",
        F.count(F.lit(1)).over(fr).alias("cn"),
        F.sum("day").over(fr).alias("sx"),
        F.sum("n").over(fr).alias("sy"),
        F.sum(F.col("day") * F.col("n")).over(fr).alias("sxy"),
        F.sum(F.col("day") * F.col("day")).over(fr).alias("sxx"),
    )
    den = F.col("cn") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("cn") * F.col("sxy") - F.col("sx") * F.col("sy")
    return w.select(
        "event_type",
        "day",
        "n",
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
    )


# ---------------------------------------------------------------------
# funnel_latency — per-transition latency percentiles for users who
# complete each funnel step (same strict ordering as
# funnel_conversion).
# ---------------------------------------------------------------------

_LAT_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         COALESCE(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS viewed_before
  FROM events
),
flagged2 AS (
  SELECT user_id, ts, event_type, viewed_before,
         CASE WHEN event_type = 'click' AND viewed_before = 1 THEN 1 ELSE 0 END AS is_qc,
         COALESCE(max(CASE WHEN event_type = 'click' AND viewed_before = 1
                           THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS qc_before
  FROM flagged
),
per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view'
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fv,
         min(CASE WHEN is_qc = 1
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fqc,
         min(CASE WHEN event_type = 'purchase' AND qc_before = 1
                  THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS fqp
  FROM flagged2 GROUP BY user_id
)
SELECT transition, n_users, p50_s, p90_s, max_s FROM (
  SELECT 'view_to_click' AS transition,
         CAST(COUNT(fqc - fv) AS BIGINT) AS n_users,
         quantile_cont(fqc - fv, 0.5) AS p50_s,
         quantile_cont(fqc - fv, 0.9) AS p90_s,
         CAST(max(fqc - fv) AS BIGINT) AS max_s
  FROM per_user WHERE fqc IS NOT NULL
  UNION ALL
  SELECT 'click_to_purchase',
         CAST(COUNT(fqp - fqc) AS BIGINT),
         quantile_cont(fqp - fqc, 0.5),
         quantile_cont(fqp - fqc, 0.9),
         CAST(max(fqp - fqc) AS BIGINT)
  FROM per_user WHERE fqp IS NOT NULL
) ORDER BY transition
"""


@register("funnel_latency", _LAT_SQL)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency distribution between completed funnel steps: seconds
    from first view to first qualifying click and from that click to
    the first qualifying purchase, summarized as p50/p90 (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, bit-portable) and the
    exact BIGINT max over converting users. Same single-exchange
    window shape as funnel_conversion; latencies are epoch-second
    BIGINT differences."""
    ev = read_table(spark, "events", sf_dir)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.coalesce(F.max(is_view).over(w_prev), F.lit(0)).alias("viewed_before"),
    )
    is_qc = F.when(
        (F.col("event_type") == "click") & (F.col("viewed_before") == 1), 1
    ).otherwise(0)
    flagged2 = flagged.select(
        "user_id",
        "ts",
        "event_type",
        is_qc.alias("is_qc"),
        F.coalesce(F.max(is_qc).over(w_prev), F.lit(0)).alias("qc_before"),
    )
    es = F.expr("CAST(ts AS LONG)")
    per_user = flagged2.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", es)).alias("fv"),
        F.min(F.when(F.col("is_qc") == 1, es)).alias("fqc"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("qc_before") == 1), es
            )
        ).alias("fqp"),
    )

    def leg(name: str, a: str, b: str) -> DataFrame:
        lat = (F.col(b) - F.col(a)).alias("lat")
        return (
            per_user.where(F.col(b).isNotNull())
            .select(lat)
            .agg(
                F.lit(name).alias("transition"),
                F.count("lat").alias("n_users"),
                F.expr("percentile(lat, 0.5)").alias("p50_s"),
                F.expr("percentile(lat, 0.9)").alias("p90_s"),
                F.max("lat").alias("max_s"),
            )
        )

    return (
        leg("view_to_click", "fv", "fqc")
        .unionByName(leg("click_to_purchase", "fqc", "fqp"))
        .orderBy("transition")
    )


# ---------------------------------------------------------------------
# skew_profile — per-key-column frequency-skew diagnostics: the
# numbers a planner reads before choosing broadcast / salting / AQE
# skew-join for a shuffle key.
# ---------------------------------------------------------------------

_SKEW_KEYS = [
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
]

_SKEW_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS key_name,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(MAX(c) AS BIGINT) AS max_cnt,
       quantile_cont(c, 0.5) AS p50_cnt,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_share,
       CAST((MAX(c) * COUNT(*)) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS skew_ratio
FROM (SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS c FROM {tbl} GROUP BY 1)"""
    for label, tbl, key in _SKEW_KEYS
)
_SKEW_SQL = f"SELECT * FROM (\n{_SKEW_SQL}\n) ORDER BY key_name"


@register("skew_profile", _SKEW_SQL)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profile of the three canonical shuffle keys: key
    cardinality, max and median per-key row counts (``percentile`` ≡
    ``quantile_cont``), the heaviest key's row share, and
    skew_ratio = max_cnt / mean_cnt (rearranged to the all-integer
    (max·n_keys)/n_rows before ONE mirrored division). skew_ratio ≈ 1
    ⇒ uniform (hash-partition freely); a large ratio ⇒ salt or rely
    on AQE skew-splitting (join_skew_aqe demonstrates the cure this
    qname diagnoses). Per-key counts are map-side-combining
    aggregates; the stats pass aggregates |keys| rows."""
    parts = []
    for label, tbl, key in _SKEW_KEYS:
        t = read_table(spark, tbl, sf_dir)
        c = t.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("c"))
        parts.append(
            c.agg(
                F.lit(label).alias("key_name"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("c").alias("n_rows"),
                F.max("c").alias("max_cnt"),
                F.expr("percentile(c, 0.5)").alias("p50_cnt"),
                (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
                    "top_share"
                ),
                (
                    (F.max("c") * F.count(F.lit(1))).cast("double")
                    / F.sum("c").cast("double")
                ).alias("skew_ratio"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_name")
