"""Wave-27 qnames (round 7, third continuation session): per-key rate
limiting, type-token ratio, leakage-safe group split, and 2-D
histogram — hot-key downsampling, corpus-richness, ML-split-hygiene
and density primitives.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..26 sets listed in queries.py.

Engine-parity posture: the rate-limit keep-set is the top-k of the
portable 60-bit md5 hash per user (Spark ``conv(hex,16,10)`` ≡
DuckDB ``('0x'||hex)::BIGINT``), DESC with the unique event_id
tiebreak — a deterministic, partition-invariant sample mirrored as
ROW_NUMBER in the oracle; the group split's keep test is the exact
integer comparison 5·h32 < 4·2³² (hash of the USER, so a user's
events can never straddle splits); tokens follow the repo-wide
normalize-lower-alnum rule (operators/text.normalize_for_fingerprint
≡ the shared _NORM_SQL literal); histogram bin ids are integer DIV
with a LEAST overflow clamp.

Scale posture (local[32] today, 1000 executors tomorrow):

- **rate_limit_keys**: topk_per_group_scale (operators/scale.py) —
  the shuffle carries at most k rows per (input-partition, user),
  never a user's full event history; the before/after frames are
  |types| rows each.
- **ttr_stats**: one (source, token) shuffle for the per-token
  counts; distinct/hapax/total collapse map-side after it.
- **group_split**: a per-row integer hash test (no shuffle at all
  until the |splits|-row rollup); n_users via distinct user — the
  only exchange.
- **histogram_2d**: ONE map-side-combining aggregate to ≤ |price
  bins|·|qty bins| cells.

Reference parity: the reference ETL has no analytics of this family;
these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register
from books2scrape_etl_spark.query_defs import _NORM_SQL

_RATE_K = 40

# ---------------------------------------------------------------------
# rate_limit_keys — cap every user at k events (deterministic hash-
# order keep-set), report per-type survival.
# ---------------------------------------------------------------------

_RATE_SQL = f"""
WITH h AS (
  SELECT event_type, user_id, event_id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hk
  FROM events
),
r AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY hk DESC, event_id DESC) AS rn
  FROM h
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(SUM(CASE WHEN rn <= {_RATE_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_after,
       CAST(SUM(CASE WHEN rn <= {_RATE_K} THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS keep_share
FROM r GROUP BY 1 ORDER BY 1
"""


@register("rate_limit_keys", _RATE_SQL)
def q_rate_limit_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key rate limiting: every user keeps at most 40 events —
    the ones with the top-40 portable md5 hashes (event_id tiebreak),
    a deterministic, partition-invariant choice that needs no
    timestamps and never changes under reprocessing. Reported as
    per-type before/after counts + keep share (mirrored division).
    This is the "cap the 1M-event user before training" primitive.

    Scale: the keep-set comes from topk_per_group_scale — the shuffle
    carries at most k candidate rows per (input-partition, user),
    never a hot user's full history (the whole point when one key has
    1e8 events); the rollups are |types|-row frames."""
    from books2scrape_etl_spark.operators.scale import topk_per_group_scale

    ev = read_table(spark, "events", sf_dir)
    h = ev.select(
        "event_type",
        "user_id",
        "event_id",
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hk"),
    )
    kept = topk_per_group_scale(
        h, ["user_id"], ["hk", "event_id", "event_type"], _RATE_K
    )
    before = h.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_before"))
    after = kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_after"))
    # LEFT join: a type whose every event falls outside each user's
    # top-k cap has no `after` row but must still report n_after = 0
    # (the oracle computes both counts from one scan and always emits
    # the type).
    return (
        before.join(after, "event_type", "left")
        .select(
            "event_type",
            "n_before",
            F.coalesce("n_after", F.lit(0)).cast("bigint").alias("n_after"),
            (
                F.coalesce("n_after", F.lit(0)).cast("double")
                / F.col("n_before").cast("double")
            ).alias("keep_share"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------
# ttr_stats — lexical richness per source: type-token ratio and hapax
# share over the repo-standard normalized token stream.
# ---------------------------------------------------------------------

_TTR_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS token
  FROM documents
),
t2 AS (SELECT source, token FROM toks WHERE token <> ''),
tc AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
       FROM t2 GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_tokens,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS ttr,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS hapax_share
FROM tc GROUP BY 1 ORDER BY 1
"""


@register("ttr_stats", _TTR_SQL)
def q_ttr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical richness per source feed: type-token ratio
    (distinct/total) and hapax share (once-seen / distinct) over the
    repo-standard normalized token stream (lowercase alnum runs —
    operators/text.normalize_for_fingerprint, the same rule every
    dedup/vocab/tf-idf qname uses, so richness is computed on the
    exact vocabulary the rest of the pipeline sees). Low TTR + low
    hapax share is the boilerplate-corpus smell a data-quality gate
    screens for. Both ratios are single mirrored BIGINT divisions.

    Scale: one (source, token) shuffle builds per-token counts;
    everything after is a map-side-combining |sources|-row rollup."""
    from books2scrape_etl_spark.operators.text import normalize_for_fingerprint

    docs = read_table(spark, "documents", sf_dir)
    toks = F.split(normalize_for_fingerprint(F.col("text")), r" ")
    t2 = docs.select("source", F.explode(toks).alias("token")).where(
        F.col("token") != ""
    )
    tc = t2.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum((F.col("c") == 1).cast("bigint"))
    total = F.sum("c").cast("bigint")
    distinct = F.count(F.lit(1))
    return (
        tc.groupBy("source")
        .agg(
            total.alias("total_tokens"),
            distinct.alias("distinct_tokens"),
            hapax.cast("bigint").alias("hapax_tokens"),
            (distinct.cast("double") / total.cast("double")).alias("ttr"),
            (hapax.cast("double") / distinct.cast("double")).alias("hapax_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------
# group_split — leakage-safe train/test split BY USER: the hash test
# runs on user_id, so no user's events ever straddle the boundary.
# ---------------------------------------------------------------------

_GSPLIT_SQL = """
WITH h AS (
  SELECT user_id, event_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h32
  FROM events
),
s AS (
  SELECT CASE WHEN 5 * h32 < 4 * 4294967296 THEN 'train' ELSE 'test' END
           AS split,
         user_id
  FROM h
)
SELECT split,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY 1 ORDER BY 1
"""


@register("group_split", _GSPLIT_SQL)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/20 split BY USER: the keep test is the exact
    integer comparison 5·h32 < 4·2³² on the portable 32-bit md5 hash
    of user_id — hashing the GROUP key (not the row) guarantees every
    user's events land wholly in one split, the hygiene rule that
    keeps per-user signal out of a held-out set. Contrast
    split_train_test, which splits rows. Deterministic and
    partition-invariant; reported as per-split user/event counts.

    Scale: a per-row integer test (no shuffle) followed by one
    2-row rollup; the distinct-user count is the only exchange."""
    ev = read_table(spark, "events", sf_dir)
    h32 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    s = ev.select(
        F.when(5 * h32 < F.lit(4 * 4294967296), "train")
        .otherwise("test")
        .alias("split"),
        "user_id",
    )
    return (
        s.groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------
# histogram_2d — price x quantity density grid over lineitem (fixed
# integer bin edges, LEAST-clamped overflow bin).
# ---------------------------------------------------------------------

_H2D_PRICE_STEP = 10_000_00  # $10k in cents per price bin
_H2D_PRICE_MAX_BIN = 9
_H2D_QTY_STEP = 10

_H2D_SQL = f"""
WITH b AS (
  SELECT least(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // {_H2D_PRICE_STEP}, {_H2D_PRICE_MAX_BIN}) AS price_bin,
         (CAST(l_quantity AS BIGINT) - 1) // {_H2D_QTY_STEP} AS qty_bin
  FROM lineitem
),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM b)
SELECT CAST(price_bin AS BIGINT) AS price_bin,
       CAST(qty_bin AS BIGINT) AS qty_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS DOUBLE) / CAST(min(t.total) AS DOUBLE) AS share
FROM b, t GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("histogram_2d", _H2D_SQL)
def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D density grid (the heatmap primitive): price × quantity
    joint distribution over lineitem, with fixed integer bin edges —
    price_bin = LEAST(cents DIV $10k, 9) (overflow clamped into the
    top bin), qty_bin = (qty−1) DIV 10. Bin ids are pure integer
    arithmetic; the share is one mirrored division by the broadcast
    1-row total.

    Scale: ONE map-side-combining aggregate to ≤ 10·5 cells; the
    total attaches as a 1-row broadcast."""
    li = read_table(spark, "lineitem", sf_dir)
    b = li.select(
        F.least(
            F.expr(
                f"CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                f" DIV {_H2D_PRICE_STEP}"
            ),
            F.lit(_H2D_PRICE_MAX_BIN),
        )
        .cast("bigint")
        .alias("price_bin"),
        F.expr(f"(CAST(l_quantity AS BIGINT) - 1) DIV {_H2D_QTY_STEP}")
        .cast("bigint")
        .alias("qty_bin"),
    )
    total = b.agg(F.count(F.lit(1)).alias("total"))
    return (
        b.groupBy("price_bin", "qty_bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "price_bin",
            "qty_bin",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("price_bin", "qty_bin")
    )
