"""Wave-11 qnames (round 6, continued): corpus relevance scoring,
change-data-capture, per-group exact percentiles, BPE pair counting,
Z-order layout, and decayed feature windows.

Placed just past the 50-entry driver window (the r6 window carries the
rotation set); rotate in for round 7 with the r6-green rows swapping
out.

Engine-parity notes baked into the designs (measured on this host):

- ``ln``/``pow`` are NOT bit-portable between the JVM and DuckDB
  (44/500 ln inputs and 1/20 pow inputs differ at the last ulp), so
  ``tfidf_bm25`` joins a Python-precomputed idf literal table into
  BOTH engines and ``ewma_decay`` injects the decay weights as literal
  doubles — no libm call on either side.
- Exact interpolated percentiles ARE bit-portable (Spark
  ``percentile`` vs DuckDB ``quantile_cont``, 0 mismatches across the
  probe domain), so ``group_percentiles`` hash-matches raw doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register
from books2scrape_etl_spark.query_defs import _NORM_SQL, topk_with_rank

# ---------------------------------------------------------------------
# group_percentiles — exact interpolated quantiles per group
# ---------------------------------------------------------------------

_GROUP_PCTL_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.50) AS p50,
       quantile_cont(l_extendedprice, 0.75) AS p75,
       quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25)
         AS iqr
FROM lineitem GROUP BY l_returnflag
"""


@register("group_percentiles", _GROUP_PCTL_SQL)
def q_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (p25/p50/p75 + IQR) via Spark's
    ``percentile`` aggregate — linear interpolation, bit-identical to
    DuckDB's ``quantile_cont`` (measured: 0 ulp mismatches), so the
    raw doubles hash-match with no rounding shim.

    Plan shape: a partial+final aggregate on the group key — percentile
    state is the per-group value buffer, so parallelism is groups and
    the shuffle carries (key, values). For heavy groups at 100 TB the
    GK-sketch twin (``approx_percentile``, bounds pinned by
    approx_bounds) replaces it; this is the exact form for
    dimension-cardinality groups."""
    li = read_table(spark, "lineitem", sf_dir)
    p = lambda q: F.percentile("l_extendedprice", F.lit(q))  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        p(0.25).alias("p25"),
        p(0.50).alias("p50"),
        p(0.75).alias("p75"),
        (p(0.75) - p(0.25)).alias("iqr"),
    )


# ---------------------------------------------------------------------
# snapshot_cdc — change-data-capture diff between two table snapshots
# ---------------------------------------------------------------------

_CDC_V2_SQL = """
  SELECT o_orderkey, o_custkey,
         -- IEEE-pure cent rounding (floor(x*100+0.5)/100): round(x, 2)
         -- hits the Spark-HALF_UP vs DuckDB-rint half-boundary split
         -- (the tpch_q2 bug class, r5)
         CASE WHEN o_orderkey % 7 = 3
              THEN floor(o_totalprice * CAST('1.1' AS DOUBLE) * 100.0 + 0.5) / 100.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_totalprice, 'N'
  FROM orders WHERE o_orderkey % 13 = 5
"""

_SNAPSHOT_CDC_SQL = f"""
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
),
v2 AS ({_CDC_V2_SQL})
SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
       CASE WHEN v1.o_orderkey IS NULL THEN 'I'
            WHEN v2.o_orderkey IS NULL THEN 'D'
            ELSE 'U' END AS change_type,
       v1.o_totalprice AS old_totalprice,
       v2.o_totalprice AS new_totalprice,
       v1.o_orderstatus AS old_status,
       v2.o_orderstatus AS new_status
FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
   OR v1.o_totalprice <> v2.o_totalprice
   OR v1.o_orderstatus <> v2.o_orderstatus
"""


@register("snapshot_cdc", _SNAPSHOT_CDC_SQL)
def q_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots — the diff every
    incremental lakehouse sync needs: full outer join on the key,
    classify Insert / Update / Delete, drop unchanged rows. The v2
    snapshot is derived from v1 by deterministic rules (delete keys
    %97=0, +10% price on %7=3, re-keyed inserts from %13=5) so the
    oracle replays the whole scenario.

    Plan shape: one shuffle per side on the join key, then a
    row-local CASE — no windows, no skew (keys unique per side). At
    100 TB both snapshots bucket by the key and the diff joins
    shuffle-free; unchanged-row elimination pushes no predicate below
    the join by construction (it needs both sides), which is exactly
    where the cost belongs."""
    o = read_table(spark, "orders", sf_dir)
    v1 = o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    cents = F.floor(F.col("o_totalprice") * 1.1 * 100.0 + 0.5) / 100.0
    survivors = v1.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 7 == 3, cents)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    inserts = v1.where(F.col("o_orderkey") % 13 == 5).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
        F.lit("N").alias("o_orderstatus"),
    )
    v2 = survivors.unionByName(inserts)
    from books2scrape_etl_spark.operators.scd import snapshot_diff

    return snapshot_diff(
        v1,
        v2,
        key="o_orderkey",
        compare_cols=[("o_totalprice", "totalprice"), ("o_orderstatus", "status")],
    )


# ---------------------------------------------------------------------
# tfidf_bm25 — corpus relevance scoring with a portable idf table
# ---------------------------------------------------------------------

_BM25_K1, _BM25_B = 1.2, 0.75
_TFIDF_MIN_DF = 5


# ln is not bit-portable across engines, and N (corpus size) is only
# known at RUN time while oracle SQL must be static. Both constraints
# dissolve by making the scores SEPARABLE in integer logs:
#     idf_plain = ln(N/df)     = L(N)   - L(df)
#     idf_bm25  = ln((N+1)/df) = L(N+1) - L(df)   (smoothed RSJ form)
# where L(i) = ln(i) comes from ONE Python-precomputed literal table
# over the integers — both engines subtract the identical doubles, so
# every derived score is the identical IEEE op sequence. The table is
# sized to the largest sweep corpus (sf0.1 → 5000 docs; +1 for N+1);
# unused rows are dead literals, and the join resolves the runtime N
# via a subquery on stats.
_IDF_TABLE_MAX = 5001

_LN_TABLE = [(i, math.log(i)) for i in range(1, _IDF_TABLE_MAX + 1)]

# CAST each literal FROM A STRING: DuckDB parses bare decimal literals
# as DECIMAL, and its decimal->double conversion mis-rounds some
# 17-digit values by an ulp (measured: ln(25) off by one bit), while
# the string->double cast is correctly rounded (0/5001 mismatches).
# Spark-side floats come from the identical Python doubles.
_LN_VALUES_SQL = "(VALUES " + ", ".join(
    f"({i}, CAST('{v!r}' AS DOUBLE))" for i, v in _LN_TABLE
) + ") AS lns(i, ln_i)"

_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS token
  FROM documents
),
t2 AS (SELECT doc_id, token FROM toks WHERE token <> ''),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM t2 GROUP BY doc_id, token
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_len
  FROM dl
),
dfq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf GROUP BY token HAVING COUNT(*) >= {_TFIDF_MIN_DF}
),
lns AS (SELECT * FROM {_LN_VALUES_SQL}),
lnn AS (
  SELECT ln_n.ln_i AS ln_n, ln_n1.ln_i AS ln_n1
  FROM stats
  JOIN lns ln_n ON ln_n.i = stats.n_docs
  JOIN lns ln_n1 ON ln_n1.i = stats.n_docs + 1
)
SELECT tf.doc_id, tf.token, tf.tf, dfq.df, dl.dl,
       tf.tf * (lnn.ln_n - lnd.ln_i) AS tfidf,
       -- mirrors the Spark expression tree op-for-op: constants are
       -- Python-prefolded doubles (DuckDB would fold bare decimal
       -- literals in exact DECIMAL), parens pin idf*(num/den) and
       -- omb + (b*((dl*n)/total)) — any other association drifts ulps
       (lnn.ln_n1 - lnd.ln_i) * ((tf.tf * CAST('{_BM25_K1 + 1.0!r}' AS DOUBLE)) /
         (tf.tf + CAST('{_BM25_K1!r}' AS DOUBLE) *
          (CAST('{1.0 - _BM25_B!r}' AS DOUBLE) + CAST('{_BM25_B!r}' AS DOUBLE) *
           (CAST(dl.dl AS DOUBLE) * CAST(stats.n_docs AS DOUBLE)
             / CAST(stats.total_len AS DOUBLE)))))
         AS bm25
FROM tf
JOIN dfq USING (token)
JOIN dl USING (doc_id)
JOIN lns lnd ON lnd.i = dfq.df
CROSS JOIN lnn
CROSS JOIN stats
"""


@register("tfidf_bm25", _TFIDF_SQL)
def q_tfidf_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(document, term) TF-IDF and BM25 relevance scores over the
    corpus vocabulary (df >= 5) — the scoring stage of corpus search /
    retrieval-based dedup.

    Portability: ln() differs between the JVM and DuckDB at the last
    ulp (measured 44/500 inputs), so both scores are SEPARABLE integer
    logs — idf_plain = L(N) - L(df), idf_bm25 = L(N+1) - L(df)
    (smoothed Robertson-Sparck-Jones form) — with L(i) = ln(i) from
    one Python-precomputed literal table. Both engines subtract the
    identical doubles, and the runtime corpus size N resolves through
    a join on the 1-row stats aggregate, so the static oracle SQL
    needs no baked-in N. The saturation part of BM25 is pure rational
    arithmetic; avgdl rides as dl*n_docs/total_len (the same exact
    divisions on both sides).

    Plan shape: one token explode feeding tf (groupBy doc,token —
    collapses map-side), dl and df derive from tf (tiny), the ln table
    is a broadcast of literal rows, stats is a 1-row broadcast. Only
    (doc_id, token, tf) ever shuffles. The literal table is an
    ORACLE-PARITY device for test SFs; at 100 TB you'd compute F.log
    in-plan (no cross-engine replay to satisfy) and nothing else
    changes."""
    from books2scrape_etl_spark.operators.freq import tokens_of

    docs = read_table(spark, "documents", sf_dir)
    lns = spark.createDataFrame(_LN_TABLE, "i long, ln_i double")
    toks = tokens_of(docs)
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    # the 1-row scalar frame (n_docs, total_len, ln_n, ln_n1): two
    # equi-joins into the ln table, then one broadcast crossJoin onto
    # the per-(doc, token) rows — a BroadcastNestedLoopJoin of a 1-row
    # side, NOT a CartesianProduct (a literal-j equi-join constant-folds
    # into exactly that and trips the registry plan lint).
    # LEFT joins + in-plan raise_error (ADVICE r6): an INNER join of a
    # corpus larger than _IDF_TABLE_MAX would drop the scalar row and
    # silently empty the whole result (and the oracle would go empty
    # the same way — a vacuous hash pass). The left form keeps the
    # 1-row frame alive and fails the job loudly instead.
    def _ln_or_fail(which: str) -> F.Column:
        return F.when(
            (F.col("n_docs") >= 1) & F.col("ln_i").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"tfidf_bm25: corpus size for {which} exceeds "
                        f"_IDF_TABLE_MAX={_IDF_TABLE_MAX}; n_docs="
                    ),
                    F.col("n_docs").cast("string"),
                )
            ).cast("double"),
        ).otherwise(F.col("ln_i"))

    scal = (
        stats.join(F.broadcast(lns), F.col("i") == F.col("n_docs"), "left")
        .select("n_docs", "total_len", _ln_or_fail("ln(N)").alias("ln_n"))
        .join(
            F.broadcast(lns.select(F.col("i").alias("i"), F.col("ln_i"))),
            F.col("i") == F.col("n_docs") + 1,
            "left",
        )
        .select(
            "n_docs", "total_len", "ln_n", _ln_or_fail("ln(N+1)").alias("ln_n1")
        )
    )
    dfq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= _TFIDF_MIN_DF)
    )
    avgdl_inv = (
        F.col("dl").cast("double")
        * F.col("n_docs").cast("double")
        / F.col("total_len").cast("double")
    )
    sat = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf") + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * avgdl_inv)
    )
    return (
        tf.join(F.broadcast(dfq), "token")
        .join(F.broadcast(dl), "doc_id")
        .join(F.broadcast(lns.select(F.col("i").alias("df"), F.col("ln_i").alias("ln_df"))), "df")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            "dl",
            (F.col("tf") * (F.col("ln_n") - F.col("ln_df"))).alias("tfidf"),
            ((F.col("ln_n1") - F.col("ln_df")) * sat).alias("bm25"),
        )
    )


# ---------------------------------------------------------------------
# bpe_pairs — the counting step of a BPE tokenizer-training iteration
# ---------------------------------------------------------------------

_BPE_TOPK = 30

_BPE_SQL = f"""
WITH words AS (
  SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents
),
w2 AS (SELECT w FROM words WHERE len(w) >= 2),
pairs AS (
  SELECT substr(w, i, 2) AS pair
  FROM w2, unnest(generate_series(1, len(w) - 1)) AS t(i)
),
counts AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY pair
)
SELECT pair, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS INTEGER) AS rank
FROM counts
QUALIFY rank <= {_BPE_TOPK}
"""


@register("bpe_pairs", _BPE_SQL)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adjacent-symbol-pair counting step of BPE tokenizer training
    (Sennrich et al. 2016): count every within-word character bigram
    across the corpus, return the top-30 merge candidates with a
    deterministic (count desc, pair asc) tiebreak. A full BPE trainer
    iterates this count -> merge loop; the count is the distributed
    part (the merge table is driver-sized by construction).

    Plan shape: the pair fan-out happens INSIDE the scan stage (two
    nested generators — no Python, no shuffle of raw text); only
    (pair, count) partials shuffle, and top-k plans as
    TakeOrderedAndProject via the rank-the-top-k pattern."""
    from books2scrape_etl_spark.operators.text import normalize_for_fingerprint

    docs = read_table(spark, "documents", sf_dir)
    words = docs.select(
        F.explode(F.split(normalize_for_fingerprint(F.col("text")), " ")).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    keys = (F.col("cnt").desc(), F.col("pair").asc())
    return topk_with_rank(counts, keys, _BPE_TOPK, rank_col="rank")


# ---------------------------------------------------------------------
# zorder_cluster — Morton-curve layout key for multi-dimension pruning
# ---------------------------------------------------------------------

_Z_BITS = 10


def _morton_sql(xcol: str, ycol: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZORDER_SQL = f"""
WITH k AS (
  SELECT l_orderkey, l_linenumber,
         l_partkey % {1 << _Z_BITS} AS x, l_suppkey % {1 << _Z_BITS} AS y
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, x, y,
       CAST({_morton_sql('x', 'y', _Z_BITS)} AS BIGINT) AS zval
FROM k
"""


def morton_col(x, y, bits: int = _Z_BITS):
    """Z-order (Morton) interleave of two ``bits``-bit columns as a
    Catalyst expression — pure integer bit ops, engine-portable."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + ((x.bitwiseAND(1 << i) / (1 << i)).cast("long") * (1 << (2 * i)))
        z = z + ((y.bitwiseAND(1 << i) / (1 << i)).cast("long") * (1 << (2 * i + 1)))
    return z


@register("zorder_cluster", _ZORDER_SQL)
def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (partkey, suppkey): interleave
    the low 10 bits of each dimension so range-partitioning on zval
    co-locates rows that are close in BOTH dimensions — the layout
    trick behind multi-column data skipping (Delta/Iceberg OPTIMIZE
    ZORDER). The qname value-matches the key computation (pure integer
    bit arithmetic, identical on any engine); the clustering BENEFIT —
    per-partition bounding boxes shrinking vs a single-column sort —
    is pinned by a unit test (tests/test_ops.py) since it is a
    file-statistics property, not a row value.

    Plan shape: a projection — zero shuffles here; the production
    write is repartitionByRange(zval) + sortWithinPartitions(zval),
    one range shuffle, the same cost as any sorted write."""
    li = read_table(spark, "lineitem", sf_dir)
    x = (F.col("l_partkey") % (1 << _Z_BITS)).cast("long")
    y = (F.col("l_suppkey") % (1 << _Z_BITS)).cast("long")
    k = li.select(
        "l_orderkey", "l_linenumber", x.alias("x"), y.alias("y")
    )
    return k.select(
        "l_orderkey",
        "l_linenumber",
        "x",
        "y",
        morton_col(F.col("x"), F.col("y")).alias("zval"),
    )


# ---------------------------------------------------------------------
# ewma_decay — exponentially-decayed trailing feature, literal weights
# ---------------------------------------------------------------------

_EWMA_ALPHA, _EWMA_N = 0.9, 10
_EWMA_WEIGHTS = [_EWMA_ALPHA**j for j in range(_EWMA_N)]  # newest-first

# string-cast each weight: bare decimal literals take DuckDB's DECIMAL
# path whose double conversion can mis-round 17-digit values (see the
# ln-table comment above)
_EWMA_W_SQL = "[" + ", ".join(f"CAST('{w!r}' AS DOUBLE)" for w in _EWMA_WEIGHTS) + "]"

_EWMA_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
),
arr AS (
  SELECT event_id, user_id, es, value,
         list(value) OVER (PARTITION BY user_id ORDER BY es, event_id
                           ROWS BETWEEN {_EWMA_N - 1} PRECEDING AND CURRENT ROW)
           AS vals
  FROM e
)
SELECT event_id, user_id, es,
       CAST(len(vals) AS BIGINT) AS n_window,
       list_sum(list_transform(
         list_zip(list_reverse(vals), {_EWMA_W_SQL}[1:len(vals)]),
         p -> p[1] * p[2])) AS ewma_num
FROM arr
"""


@register("ewma_decay", _EWMA_SQL)
def q_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed trailing-window feature per user — the
    recency-weighted activity signal ML feature stores compute: over
    the last 10 events (event-time ordered, event_id tiebreak), sum
    value_i * alpha^age_i with alpha=0.9.

    The decay weights are PYTHON-computed literal doubles injected
    into both engines (pow() is not bit-portable — measured), and the
    weighted sum runs as higher-order array functions over a windowed
    collect (reverse -> zip with the weight prefix -> fold): no libm,
    no UDF, one window whose state is <= 10 doubles per user.

    Plan shape: one shuffle on user_id for the window; everything
    after is row-local HOF arithmetic inside codegen."""
    from books2scrape_etl_spark.query_defs import _utc

    _utc(spark)
    ev = read_table(spark, "events", sf_dir)
    e = ev.select(
        "event_id", "user_id", "value", F.col("ts").cast("long").alias("es")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(-(_EWMA_N - 1), Window.currentRow)
    )
    weights = F.array(*[F.lit(x) for x in _EWMA_WEIGHTS])
    arr = e.withColumn("vals", F.collect_list("value").over(w))
    num = F.aggregate(
        F.zip_with(
            F.reverse(F.col("vals")),
            F.slice(weights, 1, F.size("vals")),
            lambda v, wt: v * wt,
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return arr.select(
        "event_id",
        "user_id",
        "es",
        F.size("vals").cast("long").alias("n_window"),
        num.alias("ewma_num"),
    )


# ---------------------------------------------------------------------
# tokenize_ids — vocabulary application: text -> token-id sequences
# ---------------------------------------------------------------------

_TOKENIZE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS token,
         generate_subscripts(string_split({_NORM_SQL}, ' '), 1) AS pos
  FROM documents
),
t2 AS (SELECT doc_id, token, pos FROM toks WHERE token <> ''),
counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM t2 GROUP BY token
),
vocab AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS BIGINT) AS tok_id
  FROM counts QUALIFY tok_id <= 100
),
ids AS (
  SELECT t2.doc_id, t2.pos, COALESCE(vocab.tok_id, 0) AS tok_id
  FROM t2 LEFT JOIN vocab USING (token)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(CASE WHEN tok_id = 0 THEN 1 END) AS BIGINT) AS n_unk,
       array_to_string(list(tok_id ORDER BY pos), ',') AS ids_str
FROM ids GROUP BY doc_id
"""


@register("tokenize_ids", _TOKENIZE_SQL)
def q_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary application — the tokenizer stage between vocab
    training (vocab_topk) and sequence packing (pack_next_fit): map
    each document's token stream to ids from the top-100 frequency
    vocabulary (rank order, deterministic count-desc/token-asc
    tiebreak), OOV -> id 0, preserving POSITION order. The id sequence
    itself is the value-matched result (comma-joined), plus token and
    UNK counts.

    Plan shape: posexplode keeps token positions without a window; the
    vocab is rank-the-top-k (TakeOrderedAndProject) and broadcasts to
    the token stream, so the only wide operation is the per-doc
    regroup — which carries (doc_id, pos, id) longs, never text. The
    in-order reassembly is sort_array(collect_list(struct(pos, id)))
    inside one aggregate: ordering rides the struct sort, not a
    window."""
    from books2scrape_etl_spark.operators.text import normalize_for_fingerprint

    docs = read_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(normalize_for_fingerprint(F.col("text")), " ")
        ).alias("pos0", "token"),
    ).where(F.col("token") != "")
    # 1-based positions to match generate_subscripts
    t2 = toks.select("doc_id", "token", (F.col("pos0") + 1).alias("pos"))
    counts = t2.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = topk_with_rank(
        counts, (F.col("cnt").desc(), F.col("token").asc()), 100, rank_col="tok_id"
    ).select("token", F.col("tok_id").cast("long").alias("tok_id"))
    ids = t2.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "pos", F.coalesce("tok_id", F.lit(0)).alias("tok_id")
    )
    seq = F.transform(
        F.sort_array(F.collect_list(F.struct("pos", "tok_id"))),
        lambda s: s["tok_id"].cast("string"),
    )
    return ids.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("tok_id") == 0, 1)).alias("n_unk"),
        F.concat_ws(",", seq).alias("ids_str"),
    )


# ---------------------------------------------------------------------
# graph analytics: degree distribution (oracle-paired) + PageRank
# invariants (constant oracle — float iteration is not bit-portable)
# ---------------------------------------------------------------------

_GRAPH_DEGREE_SQL = """
WITH e AS (
  SELECT DISTINCT o_custkey AS src, -(l_suppkey + 1) AS dst
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
d AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src)
SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM d GROUP BY deg
"""


@register("graph_degree", _GRAPH_DEGREE_SQL)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree distribution of the customer→supplier purchase graph
    (how many suppliers each customer buys from) — the profiling query
    that precedes any graph algorithm: it is what tells you whether
    PageRank/CC will meet a power-law hub that needs skew handling.
    Plan: distinct edge build (one shuffle) → two map-side-collapsing
    aggregates."""
    from books2scrape_etl_spark.operators.graph import purchase_edges

    orders = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    e = purchase_edges(orders, li)
    d = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return d.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))


_PAGERANK_INVARIANTS_SQL = """
SELECT 'sum_to_one' AS check_name, TRUE AS ok
UNION ALL SELECT 'all_positive', TRUE
UNION ALL SELECT 'suppliers_hold_link_mass', TRUE
"""


@register("pagerank_invariants", _PAGERANK_INVARIANTS_SQL)
def q_pagerank_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier graph, verified through its
    mathematical invariants (the ann_recall pattern — float iteration
    order is not bit-portable, so values can't hash-match an
    independent engine):

    - sum_to_one: total rank mass conserved to 1e-9 after 5 rounds
      (teleport + dangling redistribution must exactly rebalance);
    - all_positive: teleport floor keeps every rank > 0;
    - suppliers_hold_link_mass: every edge points cust→supp, so ANY
      supplier's rank (teleport + dangling share + link mass) must
      exceed EVERY customer's (teleport + dangling share only) —
      min(supplier) > max(customer), a sharp structural property of
      the directed bipartite graph.

    A NumPy reference fixed-point comparison lives in the unit tests."""
    from books2scrape_etl_spark.operators.graph import pagerank, purchase_edges

    orders = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    # 5 rounds, not 10 (VERDICT r6 item 2): the three invariants hold
    # after ANY round count — mass conservation is per-round exact,
    # positivity is the teleport floor, and the bipartite ordering
    # appears from round 1 — so the driver row buys nothing from the
    # extra 5 dangling-scalar actions (~5-11 s). The NumPy fixed-point
    # parity test in tests/ still runs the full 10.
    pr = pagerank(purchase_edges(orders, li), iterations=5)
    agg = pr.agg(
        F.sum("pr").alias("s"),
        F.min("pr").alias("mn"),
        F.min(F.when(F.col("node") < 0, F.col("pr"))).alias("min_supp"),
        F.max(F.when(F.col("node") >= 0, F.col("pr"))).alias("max_cust"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("sum_to_one").alias("check_name"),
                    (F.abs(F.col("s") - 1.0) < 1e-9).alias("ok"),
                ),
                F.struct(
                    F.lit("all_positive").alias("check_name"),
                    (F.col("mn") > 0.0).alias("ok"),
                ),
                F.struct(
                    F.lit("suppliers_hold_link_mass").alias("check_name"),
                    (F.col("min_supp") > F.col("max_cust")).alias("ok"),
                ),
            )
        ).alias("r")
    ).select("r.check_name", "r.ok")


_ALS_INVARIANTS_SQL = """
SELECT 'rmse_beats_mean_baseline' AS check_name, TRUE AS ok
UNION ALL SELECT 'predictions_finite', TRUE
UNION ALL SELECT 'full_coverage', TRUE
"""


@register("als_invariants", _ALS_INVARIANTS_SQL)
def q_als_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS matrix factorization on the customer×supplier purchase
    counts, verified through fit invariants (the pagerank pattern —
    seeded float iteration is not bit-portable):

    - rmse_beats_mean_baseline: training RMSE of the rank-8 factor
      model must beat the global-mean predictor (if a factorization
      cannot out-fit one constant ON ITS OWN TRAINING DATA, training
      is broken);
    - predictions_finite: no NaN/Inf predictions survive;
    - full_coverage: every training pair gets a prediction
      (coldStartStrategy cannot drop in-sample rows).

    Training is JVM-side spark.ml; the invariants are one aggregate
    over the transformed training frame."""
    from books2scrape_etl_spark.operators.recommend import (
        als_fit_predict,
        purchase_ratings,
    )

    orders = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    ratings = purchase_ratings(orders, li).localCheckpoint(eager=True)
    pred = als_fit_predict(ratings)
    n_ratings = ratings.count()
    err = F.col("prediction") - F.col("rating")
    agg = pred.agg(
        F.avg(err * err).alias("mse_model"),
        F.avg(F.col("rating")).alias("mean_r"),
        F.avg(F.col("rating") * F.col("rating")).alias("mean_r2"),
        F.count(F.lit(1)).alias("n_pred"),
        F.max(
            (F.isnan("prediction") | F.col("prediction").isNull()).cast("int")
        ).alias("any_bad"),
    )
    # var(rating) = E[r^2] - E[r]^2 is the mean-predictor MSE
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("rmse_beats_mean_baseline").alias("check_name"),
                    (
                        F.col("mse_model")
                        < F.col("mean_r2") - F.col("mean_r") * F.col("mean_r")
                    ).alias("ok"),
                ),
                F.struct(
                    F.lit("predictions_finite").alias("check_name"),
                    (F.col("any_bad") == 0).alias("ok"),
                ),
                F.struct(
                    F.lit("full_coverage").alias("check_name"),
                    (F.col("n_pred") == F.lit(n_ratings)).alias("ok"),
                ),
            )
        ).alias("r")
    ).select("r.check_name", "r.ok")


_HOPPING_SQL = f"""
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type, value FROM events
),
x AS (
  SELECT es, event_type, value, (es - es % 600) - 600 * k AS window_start
  FROM e CROSS JOIN unnest([0, 1, 2]) AS t(k)
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM x
WHERE es >= window_start AND es < window_start + 1800
GROUP BY 1, 2
"""


@register("window_hopping", _HOPPING_SQL)
def q_window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2b — hopping/sliding event-time windows (30-minute size, 10-
    minute slide): the overlapping-window shape between tumbling (T2)
    and RANGE frames (window_range_time). Spark's F.window(size,
    slide) assigns each event to size/slide windows; the oracle
    replays the assignment by expanding each event into its 3 aligned
    window starts (integer epoch arithmetic — second-floor cannot
    cross a 600s boundary, so membership is truncation-safe). Window
    starts surface as epoch longs, TZ-free on both engines."""
    from books2scrape_etl_spark.query_defs import _utc
    from books2scrape_etl_spark.streaming import windows as stream_ops

    _utc(spark)
    ev = read_table(spark, "events", sf_dir)
    return stream_ops.hopping_counts_batch(ev, minutes=30, slide_minutes=10)


_ALS_TOPK_SQL = """
SELECT 'exactly_k_per_user' AS check_name, TRUE AS ok
UNION ALL SELECT 'scores_sorted_desc', TRUE
UNION ALL SELECT 'scores_finite', TRUE
UNION ALL SELECT 'full_user_coverage', TRUE
"""


@register("als_topk", _ALS_TOPK_SQL)
def q_als_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS serving path (VERDICT r6 item 8) — top-5 supplier
    recommendations per customer from the factor matrices
    (operators/recommend.py:als_topk, the recommendForAllUsers
    equivalent), verified through serve invariants (seeded float
    factors are not bit-portable, the pagerank/als_invariants
    pattern):

    - exactly_k_per_user: every user gets exactly k dense-ranked rows
      (rnk spans 1..k — a top-k that drops or duplicates ranks is
      broken);
    - scores_sorted_desc: within each user, score is non-increasing in
      rnk (the window ordered by the right key);
    - scores_finite: no NaN/Inf escapes the factor dot product;
    - full_user_coverage: every training user receives
      recommendations (ALS fits a factor row for every observed user).
    """
    from books2scrape_etl_spark.operators.recommend import (
        als_topk,
        purchase_ratings,
    )

    k = 5
    orders = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    ratings = purchase_ratings(orders, li).localCheckpoint(eager=True)
    n_users = ratings.select("user").distinct().count()
    top = als_topk(ratings, k=k)
    per_user = top.groupBy("user").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rnk").alias("min_rnk"),
        F.max("rnk").alias("max_rnk"),
        # adjacent-pair monotonicity over the rnk-sorted score list
        F.aggregate(
            F.zip_with(
                F.slice(F.array_sort(F.collect_list(F.struct("rnk", "score"))), 1, k - 1),
                F.slice(F.array_sort(F.collect_list(F.struct("rnk", "score"))), 2, k - 1),
                lambda a, b: (a["score"] >= b["score"]).cast("int"),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_sorted_pairs"),
        F.max(
            (F.isnan("score") | F.col("score").isNull()).cast("int")
        ).alias("any_bad"),
    )
    agg = per_user.agg(
        F.min((F.col("n") == k).cast("int")).alias("all_k"),
        F.min((F.col("min_rnk") == 1).cast("int")).alias("all_min1"),
        F.min((F.col("max_rnk") == k).cast("int")).alias("all_maxk"),
        F.min((F.col("n_sorted_pairs") == k - 1).cast("int")).alias("all_sorted"),
        F.max("any_bad").alias("any_bad"),
        F.count(F.lit(1)).alias("n_served"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("exactly_k_per_user").alias("check_name"),
                    (
                        (F.col("all_k") == 1)
                        & (F.col("all_min1") == 1)
                        & (F.col("all_maxk") == 1)
                    ).alias("ok"),
                ),
                F.struct(
                    F.lit("scores_sorted_desc").alias("check_name"),
                    (F.col("all_sorted") == 1).alias("ok"),
                ),
                F.struct(
                    F.lit("scores_finite").alias("check_name"),
                    (F.col("any_bad") == 0).alias("ok"),
                ),
                F.struct(
                    F.lit("full_user_coverage").alias("check_name"),
                    (F.col("n_served") == F.lit(n_users)).alias("ok"),
                ),
            )
        ).alias("r")
    ).select("r.check_name", "r.ok")
