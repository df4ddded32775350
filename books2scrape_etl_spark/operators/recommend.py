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
