"""Wave-31 qnames (round 7, third continuation session): k-anonymity
audit, feed freshness, and deterministic negative sampling — privacy,
operations and recommender-training primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..30 sets listed in queries.py.

Engine-parity posture: the k-anonymity profile is pure integer
counting over quasi-identifier groups (the balance bucket is exact
cents DIV 100000 — floor division mirrored); freshness lags are
BIGINT epoch-second differences; negative-sampling candidates come
from the portable 32-bit md5 hash of 'custkey:i' reduced modulo the
part-key span — every decision integer, no RNG, reprocessing-stable.

Scale posture (local[32] today, 1000 executors tomorrow):

- **k_anonymity**: ONE map-side-combining aggregate to |QI-domain|
  groups, then a |groups|-row profile rollup.
- **data_freshness**: one map-side aggregate to |types| rows; the
  global max attaches as a 1-row broadcast.
- **negative_sampling**: candidates explode k per customer (k rows,
  never the part table); the collision check is a LEFT join against
  the DISTINCT (custkey, partkey) positives on the composite key —
  both sides hash-partition on the same key, candidates stay
  k·|customers| regardless of fact size.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

# ---------------------------------------------------------------------
# k_anonymity — re-identification risk audit over the quasi-identifier
# (nation, segment, $1k-balance-bucket): group-size profile + rows at
# risk below k in {2, 5, 10}.
# ---------------------------------------------------------------------

_KANON_SQL = """
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000
           AS bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS gsize
  FROM customer GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(gsize) AS BIGINT) AS n_rows,
       CAST(min(gsize) AS BIGINT) AS min_group,
       CAST(SUM(CASE WHEN gsize < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_lt_2,
       CAST(SUM(CASE WHEN gsize < 2 THEN gsize ELSE 0 END) AS BIGINT)
         AS rows_lt_2,
       CAST(SUM(CASE WHEN gsize < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_lt_5,
       CAST(SUM(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT)
         AS rows_lt_5,
       CAST(SUM(CASE WHEN gsize < 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_lt_10,
       CAST(SUM(CASE WHEN gsize < 10 THEN gsize ELSE 0 END) AS BIGINT)
         AS rows_lt_10
FROM qi
"""


@register("k_anonymity", _KANON_SQL)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (nation, segment, $1k balance bucket)
    quasi-identifier: the dataset is k-anonymous iff min_group ≥ k;
    the profile reports group/row counts below k ∈ {2, 5, 10} — the
    numbers a privacy review reads before releasing the table (the
    enforcement partner to redact_pii: redaction handles direct
    identifiers, k-anonymity measures the quasi ones). The balance
    bucket is exact cents DIV 100000 — floor division mirrored in
    both engines; everything is integer counting.

    Scale: ONE map-side-combining aggregate to |QI-domain| groups,
    one profile rollup after."""
    c = read_table(spark, "customer", sf_dir)
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 100000"
        ).alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).alias("gsize"))
    cols = [
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("gsize").cast("bigint").alias("n_rows"),
        F.min("gsize").cast("bigint").alias("min_group"),
    ]
    for k in (2, 5, 10):
        below = F.col("gsize") < k
        cols.append(F.sum(below.cast("bigint")).alias(f"groups_lt_{k}"))
        cols.append(
            F.sum(F.when(below, F.col("gsize")).otherwise(0))
            .cast("bigint")
            .alias(f"rows_lt_{k}")
        )
    return qi.agg(*cols)


# ---------------------------------------------------------------------
# data_freshness — per-feed staleness: last event time, lag behind the
# freshest feed, and last-24h volume (the landing-zone health check).
# ---------------------------------------------------------------------

_FRESH_SQL = """
WITH e AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
),
g AS (SELECT max(es) AS gmax FROM e),
s AS (
  SELECT e.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         max(e.es) AS last_es,
         CAST(SUM(CASE WHEN e.es >= (SELECT gmax FROM g) - 86400
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_last_day
  FROM e GROUP BY 1
)
SELECT event_type, n_events, last_es,
       (SELECT gmax FROM g) - last_es AS lag_s, n_last_day
FROM s ORDER BY event_type
"""


@register("data_freshness", _FRESH_SQL)
def q_data_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed freshness: per event type, the last event's epoch second,
    its lag behind the freshest feed, and last-24h volume — the
    landing-zone health panel that catches a stalled producer before
    a consumer trains on a truncated day. All BIGINT epoch
    arithmetic.

    Scale: one map-side-combining aggregate to |types| rows; the
    global max attaches as a 1-row broadcast."""
    ev = read_table(spark, "events", sf_dir)
    e = ev.select("event_type", F.col("ts").cast("long").alias("es"))
    g = e.agg(F.max("es").alias("gmax"))
    s = (
        e.crossJoin(F.broadcast(g))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("es").alias("last_es"),
            F.sum(
                (F.col("es") >= F.col("gmax") - 86400).cast("bigint")
            ).alias("n_last_day"),
            F.max("gmax").alias("gmax"),
        )
    )
    return s.select(
        "event_type",
        "n_events",
        "last_es",
        (F.col("gmax") - F.col("last_es")).alias("lag_s"),
        "n_last_day",
    ).orderBy("event_type")


# ---------------------------------------------------------------------
# negative_sampling — deterministic hash negatives for a recommender:
# k candidate parts per customer, collisions with true positives
# removed, summary counts (conservation-checked).
# ---------------------------------------------------------------------

_NEG_K = 5

_NEG_SQL = f"""
WITH span AS (
  SELECT min(p_partkey) AS lo, max(p_partkey) AS hi FROM part
),
cust AS (SELECT DISTINCT o_custkey FROM orders),
cand AS (
  SELECT c.o_custkey,
         s.lo + ('0x' || substr(md5(CAST(c.o_custkey AS VARCHAR) || ':' ||
                                    CAST(i.i AS VARCHAR)), 1, 8))::BIGINT
                % (s.hi - s.lo + 1) AS cand_part
  FROM cust c, span s,
       LATERAL (SELECT unnest(generate_series(1, {_NEG_K})) AS i) i
),
pos AS (
  SELECT DISTINCT o.o_custkey, l.l_partkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
j AS (
  SELECT cand.o_custkey, cand.cand_part,
         CASE WHEN pos.l_partkey IS NULL THEN 0 ELSE 1 END AS hit
  FROM cand LEFT JOIN pos
    ON cand.o_custkey = pos.o_custkey AND cand.cand_part = pos.l_partkey
)
SELECT CAST((SELECT COUNT(*) FROM cust) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(hit) AS BIGINT) AS n_hit_positive,
       CAST(COUNT(*) - SUM(hit) AS BIGINT) AS n_negatives
FROM j
"""


@register("negative_sampling", _NEG_SQL)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for recommender training: each
    ordering customer draws 5 candidate part keys from the part-key
    span via the portable 32-bit md5 hash of 'custkey:i' (no RNG —
    the same customer always draws the same negatives, so training
    runs are reproducible and incremental reprocessing is stable);
    candidates colliding with the customer's TRUE positives (distinct
    ordered parts) are counted out via a LEFT join on the composite
    key. Summary row conserves: candidates = customers·5 =
    negatives + positive hits.

    Scale: candidates are k·|customers| rows regardless of fact size;
    the positives table is the DISTINCT (custkey, partkey) collapse
    of the fact; both sides hash on the same composite key — no
    broadcast of anything fact-sized."""
    o = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    p = read_table(spark, "part", sf_dir)
    span = p.agg(F.min("p_partkey").alias("lo"), F.max("p_partkey").alias("hi"))
    cust = o.select("o_custkey").distinct()
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("o_custkey").cast("string"),
                    F.col("i").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    cand = (
        cust.crossJoin(F.broadcast(span))
        .select(
            "o_custkey",
            "lo",
            "hi",
            F.explode(F.sequence(F.lit(1), F.lit(_NEG_K))).alias("i"),
        )
        .select(
            "o_custkey",
            (F.col("lo") + h32 % (F.col("hi") - F.col("lo") + 1)).alias("cand_part"),
        )
    )
    # pos renames o_custkey -> pos_custkey: both sides of the cand/pos
    # join derive from the same orders scan, and an o_custkey==o_custkey
    # predicate would only work via the analyzer's ambiguous-self-join
    # disambiguation (fragile under legacy analyzer settings).
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("pos_custkey"), "l_partkey")
        .distinct()
    )
    j = cand.join(
        pos,
        (cand["o_custkey"] == pos["pos_custkey"])
        & (cand["cand_part"] == pos["l_partkey"]),
        "left",
    ).select(F.when(pos["l_partkey"].isNull(), 0).otherwise(1).alias("hit"))
    n_cust = cust.agg(F.count(F.lit(1)).alias("n_customers"))
    stats = j.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("hit").cast("bigint").alias("n_hit_positive"),
        (F.count(F.lit(1)) - F.sum("hit")).cast("bigint").alias("n_negatives"),
    )
    return n_cust.crossJoin(F.broadcast(stats)).select(
        "n_customers", "n_candidates", "n_hit_positive", "n_negatives"
    )
