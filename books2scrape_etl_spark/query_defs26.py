"""Wave-26 qnames (round 7, third continuation session): day-internal
time-weighted averages, discrete survival hazard, order-independent
table checksums, and tie-inclusive top-k — market-data, churn,
data-integrity and ranking primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..25 sets listed in queries.py.

Engine-parity posture: TWAP weights are whole-second integer gaps
(floor-epoch differences — lead() carries only BIGINTs) and the
average is ONE mirrored division of exact Σ(cents·gap)/Σ(gap);
hazard is active/at-risk — two exact BIGINT counts per month offset
— divided once; checksums XOR 60-bit integers parsed from md5-hex
prefixes (Spark ``conv(hex,16,10)`` ≡ DuckDB ``('0x'||hex)::BIGINT``,
probe-verified this session) — XOR is associative/commutative, so
the fingerprint is partitioning- and order-independent by
construction; tie-inclusive top-k uses RANK over the integer
(revenue_cents DESC, type ASC)-free order — rank ties come ONLY from
exactly-equal BIGINTs, identical in both engines.

Scale posture (local[32] today, 1000 executors tomorrow):

- **twap_value**: lead() runs within (type, epoch-day) partitions —
  bounded by the day's traffic, never a whole type in one task (the
  interarrival_stats posture; cross-midnight gaps are excluded BY
  DEFINITION on both sides); Σ(cents·gap) holds in int64 to ~1e9
  rows/type-day-year (DECIMAL(38,0) documented beyond).
- **hazard_curve**: first-order months are one map-side-combining
  aggregate; at-risk counts collapse to a |offsets|-row frame joined
  to the |offsets|-row event counts.
- **table_checksum**: ONE map-side-combining XOR aggregate per table
  over 60-bit row fingerprints; output is 2 rows of metadata. This is
  the cross-copy drift detector for a 100 TB lake — mergeable,
  order-independent, and cheap to recompute per partition.
- **topk_with_ties**: per-(brand, type) revenue is one aggregate; the
  RANK window partitions by brand over ≤ |type-domain| rows.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

# ---------------------------------------------------------------------
# twap_value — time-weighted average event value per type, weighted by
# the whole-second gap to the next event within the same epoch-day.
# ---------------------------------------------------------------------

_TWAP_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT event_type, cents,
         lead(es) OVER (PARTITION BY event_type, day
                        ORDER BY es, event_id) - es AS gap_s
  FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_weighted,
       CAST(SUM(gap_s) AS BIGINT) AS total_seconds,
       CAST(SUM(cents * gap_s) AS DOUBLE) / CAST(SUM(gap_s) AS DOUBLE)
         AS twap_cents
FROM g WHERE gap_s IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


@register("twap_value", _TWAP_SQL)
def q_twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type: each event's cents
    value is weighted by the whole-second gap to the NEXT event of the
    same type within the same epoch-day (floor-epoch BIGINT
    difference; each day's last event carries no weight — the
    cross-midnight gap is excluded BY DEFINITION on both sides, the
    interarrival_stats convention that also keeps window partitions
    day-bounded). TWAP = Σ(cents·gap)/Σ(gap), one mirrored division
    of exact integer sums.

    Scale: lead() partitions by (type, day) — bounded by one day's
    traffic per type; Σ(cents·gap) needs DECIMAL(38,0) past ~1e14
    cent-seconds per type (documented, far past test SFs)."""
    ev = read_table(spark, "events", sf_dir)
    e = ev.select(
        "event_type",
        F.expr("CAST(ts AS LONG) DIV 86400").alias("day"),
        F.expr("CAST(ts AS LONG)").alias("es"),
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("es", "event_id")
    g = e.select(
        "event_type",
        "cents",
        (F.lead("es").over(w) - F.col("es")).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_weighted"),
            F.sum("gap_s").cast("bigint").alias("total_seconds"),
            (
                F.sum(F.col("cents") * F.col("gap_s")).cast("double")
                / F.sum("gap_s").cast("double")
            ).alias("twap_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# hazard_curve — discrete re-order hazard: of the customers still
# observable at month offset m after their first order, what share
# ordered at exactly that offset?
# ---------------------------------------------------------------------

_HAZARD_SQL = """
WITH om AS (
  SELECT o_custkey,
         CAST(year(dt) * 12 + month(dt) AS BIGINT) AS idx
  FROM (
    SELECT o_custkey,
           DATE '1970-01-01' + CAST(
             CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS INTEGER
           ) AS dt
    FROM orders
  )
),
f AS (SELECT o_custkey, min(idx) AS first_idx FROM om GROUP BY 1),
h AS (SELECT max(idx) AS horizon FROM om),
ev AS (
  SELECT DISTINCT om.o_custkey, om.idx - f.first_idx AS m
  FROM om JOIN f ON om.o_custkey = f.o_custkey
  WHERE om.idx > f.first_idx
),
per_max AS (
  SELECT h.horizon - f.first_idx AS max_m, CAST(COUNT(*) AS BIGINT) AS c
  FROM f, h GROUP BY 1
),
act AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS active FROM ev GROUP BY 1),
risk AS (
  SELECT a.m, CAST(SUM(p.c) AS BIGINT) AS at_risk
  FROM (SELECT DISTINCT m FROM ev) a
  JOIN per_max p ON p.max_m >= a.m
  GROUP BY 1
)
SELECT r.m AS month_offset, r.at_risk, a.active,
       CAST(a.active AS DOUBLE) / CAST(r.at_risk AS DOUBLE) AS hazard
FROM risk r JOIN act a ON r.m = a.m
ORDER BY month_offset
"""


@register("hazard_curve", _HAZARD_SQL)
def q_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete re-order hazard with right censoring: for each month
    offset m ≥ 1 after a customer's first order, at_risk = customers
    whose observation horizon (global max month − their first month)
    reaches m, active = customers with an order at exactly offset m,
    hazard = active/at_risk (one mirrored BIGINT division). Month keys
    are the integer year·12+month (the cohort_retention convention).

    Scale: first-order months are one map-side-combining aggregate;
    the at-risk side collapses to a |first-months|-domain frame
    cross-checked against the |offsets| frame — dim-sized joins
    only."""
    o = read_table(spark, "orders", sf_dir)
    day = F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
    dt = F.date_add(F.to_date(F.lit("1970-01-01")), day.cast("int"))
    midx = (F.year(dt) * 12 + F.month(dt)).cast("bigint")
    f = o.groupBy("o_custkey").agg(F.min(midx).alias("first_idx"))
    horizon = o.agg(F.max(midx).alias("horizon"))
    ev = (
        o.select("o_custkey", midx.alias("idx"))
        .join(f, "o_custkey")
        .filter(F.col("idx") > F.col("first_idx"))
        .select("o_custkey", (F.col("idx") - F.col("first_idx")).alias("m"))
        .distinct()
    )
    act = ev.groupBy("m").agg(F.count(F.lit(1)).alias("active"))
    # per-customer horizon offsets collapse to a (max_m -> count) frame
    fh = f.crossJoin(F.broadcast(horizon)).select(
        (F.col("horizon") - F.col("first_idx")).alias("max_m")
    )
    per_max = fh.groupBy("max_m").agg(F.count(F.lit(1)).alias("c"))
    offs = act.select("m")
    risk = (
        offs.join(per_max, per_max["max_m"] >= offs["m"])
        .groupBy("m")
        .agg(F.sum("c").cast("bigint").alias("at_risk"))
    )
    return (
        risk.join(act, "m")
        .select(
            F.col("m").alias("month_offset"),
            "at_risk",
            "active",
            (F.col("active").cast("double") / F.col("at_risk").cast("double")).alias(
                "hazard"
            ),
        )
        .orderBy("month_offset")
    )


# ---------------------------------------------------------------------
# table_checksum — order-independent 60-bit XOR fingerprint per table
# (orders + lineitem), over canonical integer-normalized row strings.
# ---------------------------------------------------------------------

_CHECKSUM_SQL = """
WITH ro AS (
  SELECT ('0x' || substr(md5(concat_ws('|',
           CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
           o_orderstatus,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS VARCHAR),
           CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS VARCHAR),
           o_orderpriority)), 1, 15))::BIGINT AS fp
  FROM orders
),
rl AS (
  SELECT ('0x' || substr(md5(concat_ws('|',
           CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
           CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS VARCHAR),
           l_returnflag)), 1, 15))::BIGINT AS fp
  FROM lineitem
)
SELECT * FROM (
  SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(bit_xor(fp) AS BIGINT) AS xor_fp
  FROM ro
  UNION ALL
  SELECT 'lineitem' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(bit_xor(fp) AS BIGINT) AS xor_fp
  FROM rl
) ORDER BY tbl
"""


def _row_fp(cols) -> F.Column:
    """60-bit integer fingerprint of a canonical '|'-joined row string:
    conv(md5-hex[0:15], 16, 10) — probe-verified equal to DuckDB's
    ('0x' || substr(md5, 1, 15))::BIGINT on this host."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10
    ).cast("bigint")


@register("table_checksum", _CHECKSUM_SQL)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints: per table, XOR of 60-bit
    integers parsed from the md5-hex prefix of a canonical row string
    (keys as-is, money as exact cents, dates as epoch days — every
    field integer-normalized before hashing). XOR is associative and
    commutative, so the checksum is invariant under partitioning, row
    order, AND mergeable across shards — the cheap cross-copy drift
    detector a 100 TB lake runs after every replication (two copies
    disagree ⟺ fingerprints differ, up to 2⁻⁶⁰ collisions).

    Scale: one map-side-combining XOR aggregate per table; 2 metadata
    rows out."""
    o = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("bigint")  # noqa: E731
    ro = o.select(
        _row_fp(
            [
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                cents("o_totalprice").cast("string"),
                F.expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400").cast(
                    "string"
                ),
                F.col("o_orderpriority"),
            ]
        ).alias("fp")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("fp").cast("bigint").alias("xor_fp"),
    ).select(F.lit("orders").alias("tbl"), "n_rows", "xor_fp")
    rl = li.select(
        _row_fp(
            [
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_partkey").cast("string"),
                F.col("l_suppkey").cast("string"),
                cents("l_extendedprice").cast("string"),
                F.col("l_returnflag"),
            ]
        ).alias("fp")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("fp").cast("bigint").alias("xor_fp"),
    ).select(F.lit("lineitem").alias("tbl"), "n_rows", "xor_fp")
    return ro.unionByName(rl).orderBy("tbl")


# ---------------------------------------------------------------------
# topk_with_ties — top-2 part types per brand by retail-price cents,
# INCLUDING ties (RANK, not row-limit — the "WITH TIES" semantics).
# ---------------------------------------------------------------------

_TOPK_TIES_SQL = """
WITH bt AS (
  SELECT p_brand, p_type,
         CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM part GROUP BY 1, 2
),
r AS (
  SELECT p_brand, p_type, rev_cents,
         CAST(RANK() OVER (PARTITION BY p_brand ORDER BY rev_cents DESC)
              AS BIGINT) AS rk
  FROM bt
)
SELECT p_brand, p_type, rev_cents, rk
FROM r WHERE rk <= 2
ORDER BY p_brand, rk, p_type
"""


@register("topk_with_ties", _TOPK_TIES_SQL)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-inclusive top-2 part types per brand by total retail-price
    cents — RANK ≤ k semantics (``FETCH FIRST k WITH TIES``), the
    complement to topk_ordered's exact-row-limit form: equal revenues
    all qualify, so the result can exceed 2 rows per brand. Ranks come
    from exactly-equal BIGINTs, so tie structure is identical in both
    engines; the residual (rev DESC) tie between equal types is
    resolved by the output's total ORDER BY, never by rank.

    Scale: per-(brand, type) revenue is one map-side-combining
    aggregate; the RANK window partitions by brand over at most
    |type-domain| rows — key-domain-bounded."""
    p = read_table(spark, "part", sf_dir)
    bt = p.groupBy("p_brand", "p_type").agg(
        F.sum((F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("rev_cents").desc())
    return (
        bt.withColumn("rk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rk") <= 2)
        .select("p_brand", "p_type", "rev_cents", "rk")
        .orderBy("p_brand", "rk", "p_type")
    )
