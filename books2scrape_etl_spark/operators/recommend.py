"""Collaborative filtering on the purchase graph: ALS matrix
factorization via spark.ml (SURVEY §2 L-family extension — the model
TRAINING counterpart to :mod:`operators.inference`'s embedding
generation).

Scale posture: ALS is the canonical distributed factorization — each
iteration solves per-user (then per-item) least squares against the
in-block ratings, so the shuffle carries factor vectors (rank floats
per id), never the ratings matrix; spark.ml's implementation blocks
users×items to amortize that exchange. Training runs fully JVM-side;
Python only declares the pipeline.

Determinism: ALS is seeded but float-iterative — factor values are
stable for a fixed (seed, partitioning) but NOT bit-portable across
engines or cluster layouts. Verification therefore follows the
pagerank pattern: mathematical invariants (fit beats the global-mean
baseline on its own training data, factors finite, full coverage)
as a constant-oracle driver row, plus unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_ratings(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """(user, item, rating): customer×supplier implicit-feedback counts
    — the number of lineitems connecting them. The groupBy collapses
    map-side; the ratings table is |distinct pairs|, not |fact|."""
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_suppkey").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )


def als_fit_predict(
    ratings: DataFrame,
    rank: int = 8,
    max_iter: int = 10,
    reg: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """Fit ALS on ``ratings`` and return the training set with a
    ``prediction`` column — the fit-quality frame the invariants (and
    any downstream top-k recommender) consume."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    return model.transform(ratings)


def als_topk(
    ratings: DataFrame,
    k: int = 5,
    rank: int = 8,
    max_iter: int = 10,
    reg: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """(user, item, score, rnk) — top-``k`` items per user by factor
    dot product: the serving half of the recommender
    (``recommendForAllUsers`` re-expressed as DataFrame ops over the
    factor matrices, VERDICT r6 item 8).

    Plan shape: the item-factor matrix is the SMALL side (items ≪
    users in a purchase graph) and broadcasts; user factors stream
    through one BroadcastNestedLoopJoin, the dot product runs as a
    Catalyst higher-order fold (zip_with + aggregate — zero Python),
    and the per-user top-k is a window over user (hash-partitioned,
    never global). At 100 TB of users this is one pass over the user
    factors; it's the item side going wide (ANN territory) that would
    force a different plan, not user count."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    uf = model.userFactors.select(
        F.col("id").alias("user"), F.col("features").alias("__uf")
    )
    itf = model.itemFactors.select(
        F.col("id").alias("item"), F.col("features").alias("__if")
    )
    score = F.aggregate(
        F.zip_with("__uf", "__if", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    scored = uf.crossJoin(F.broadcast(itf)).select(
        "user", "item", score.alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user").orderBy(F.col("score").desc(), F.col("item").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("user", "item", "score", "rnk")
    )
