"""Wave-18 qnames (round 7, continuation session): embedding-space
k-NN classification quality (confusion matrix) and inverse-frequency
class weighting — the supervised-evaluation / loss-weighting pair a
training-data pipeline runs over a labeled embedding table.

Placed past the 50-entry driver window; claims r8 slots together with
the wave-12..17 sets listed in queries.py.

Engine-parity posture: the cosine kernel is the PROVEN sim_cosine
contract — float64 dot products accumulate in index order in both
engines (``F.aggregate`` ≡ DuckDB list-comprehension
``list_aggregate(..., 'sum')``), sqrt/division correctly rounded, and
ranking happens on the round(6) value with a vec_id tiebreak exactly
as the oracle does. Votes, the confusion matrix, and class weights
are exact BIGINTs (one mirrored double division for the weight).

Scale posture: the query side broadcasts (bounded by contract); the
candidate scoring is one streaming projection over the big side; the
per-query top-k window partitions on q_id (AQE rank pushdown
pre-filters k per partition — the brute_force_topk shape). The
documented route past brute force is the IVF/LSH candidate pruning
already green as sim_ivf / sim_lsh / ann_recall; this qname pins the
EVALUATION semantics those approximate paths are graded against.

Reference parity: the reference ETL has no ML-evaluation analytics;
these extend the engine per the round brief (label-quality audits and
class-imbalance weighting are standard curation steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register
from books2scrape_etl_spark.query_defs import _DOT_SQL

_KNN_K = 5
_KNN_QUERY_MOD = 16  # every 16th vec_id is a held-out query

_KNN_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec, label AS true_label
  FROM embeddings WHERE vec_id % {_KNN_QUERY_MOD} = 0
),
scored AS (
  SELECT q.q_id, q.true_label, e.vec_id, e.label AS n_label,
         round({_DOT_SQL.format(a='q.q_vec', b='e.embedding')} /
               (sqrt({_DOT_SQL.format(a='q.q_vec', b='q.q_vec')}) *
                sqrt({_DOT_SQL.format(a='e.embedding', b='e.embedding')})), 6) AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.q_id
),
nn AS (
  SELECT q_id, true_label, n_label,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored QUALIFY rank <= {_KNN_K}
),
votes AS (
  SELECT q_id, true_label, n_label, CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM nn GROUP BY q_id, true_label, n_label
),
pred AS (
  SELECT q_id, true_label, n_label AS pred_label,
         row_number() OVER (PARTITION BY q_id ORDER BY n_votes DESC, n_label ASC) AS vr
  FROM votes QUALIFY vr = 1
)
SELECT CAST(true_label AS BIGINT) AS true_label,
       CAST(pred_label AS BIGINT) AS pred_label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("knn_confusion", _KNN_SQL)
def q_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote classification of every 16-th embedding
    against the rest (leave-self-out), rolled up to the label confusion
    matrix — the label-quality / separability audit for a labeled
    embedding table.

    Neighbor selection is the sim_cosine contract verbatim (rank on
    round-6 cosine with vec_id tiebreak); the vote winner breaks ties
    on (votes DESC, label ASC) so prediction is total-order
    deterministic; the confusion matrix is exact BIGINT counts."""
    from books2scrape_etl_spark.operators.similarity import cosine

    emb = read_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") % _KNN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("true_label"),
    )
    cand = emb.join(F.broadcast(q), emb["vec_id"] != q["q_id"])
    scored = cand.select(
        "q_id",
        "true_label",
        "vec_id",
        F.col("label").alias("n_label"),
        F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("cos_sim"),
    )
    wr = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    nn = (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= _KNN_K)
        .select("q_id", "true_label", "n_label")
    )
    votes = nn.groupBy("q_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("q_id").orderBy(
        F.col("n_votes").desc(), F.col("n_label").asc()
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select("q_id", "true_label", F.col("n_label").alias("pred_label"))
    )
    return (
        pred.groupBy(
            F.col("true_label").cast("bigint").alias("true_label"),
            F.col("pred_label").cast("bigint").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_label", "pred_label")
    )


# ---------------------------------------------------------------------
# class_weights — inverse-frequency loss weights over the label
# column: weight(c) = N / (|classes| * n_c), the sklearn "balanced"
# convention. One aggregate + one broadcast of two scalars.
# ---------------------------------------------------------------------

_CLASS_WEIGHTS_SQL = """
WITH c AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings GROUP BY 1
),
t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS k FROM c
)
SELECT label, n,
       CAST(total AS DOUBLE) / CAST(k * n AS DOUBLE) AS weight
FROM c CROSS JOIN t ORDER BY label
"""


@register("class_weights", _CLASS_WEIGHTS_SQL)
def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced inverse-frequency class weights (N / (k * n_c)) over
    the embedding labels — the loss-weighting table a trainer joins
    against an imbalanced dataset. One map-side-combining aggregate;
    the (total, class-count) pair broadcasts; the weight is a single
    mirrored exact-BIGINT double division."""
    emb = read_table(spark, "embeddings", sf_dir)
    c = emb.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("k"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "label",
            "n",
            (
                F.col("total").cast("double")
                / (F.col("k") * F.col("n")).cast("double")
            ).alias("weight"),
        )
        .orderBy("label")
    )
