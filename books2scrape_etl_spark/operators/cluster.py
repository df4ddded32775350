"""Lloyd's k-means as pure DataFrame aggregation — the clustering
primitive behind IVF index builds, embedding-space corpus maps, and
PQ codebook training.

Reference parity: the reference repo has no clustering; this extends
the engine's similarity family (``operators/similarity.py`` trains its
IVF coarse quantizer through ``spark.ml``). This module is the
Spark-first re-derivation of the same algorithm with an explicit,
auditable plan:

- **assignment** is a single codegen'd projection: squared L2 distance
  to each of the k broadcast centroid literals via
  ``zip_with``/``aggregate`` HOFs (runtime loop over dims — no
  expression blowup), ``array_position(min)`` for the argmin (ties
  break to the lowest cluster id, deterministically);
- **update** is ONE map-side-combining aggregation per round:
  ``groupBy(cluster).agg(count, sum(dist2), sum(element_at(vec, i)))``
  — k×(dim+2) cells cross the shuffle, never the vectors themselves,
  and nothing is exploded (no dim× row blowup);
- the per-round driver action collects exactly k rows (the new
  centroids + inertia) — the same bounded-scalar-per-round shape as
  PageRank's dangling-mass term, and the only way to fold the new
  centroids back into the next round's literal plan.

At 100 TB the per-round cost is one scan + one k-row shuffle; rounds
are independent of data size. Centroids (k×dim doubles) stay tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dist2(vec_col: Column, centroid: list[float]) -> Column:
    """Squared L2 distance between an array<float> column and a literal
    centroid, entirely JVM-side (HOF runtime loop — no codegen blowup
    at any dim)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``cluster`` (1-based, ties→lowest) and ``dist2`` (squared
    distance to the assigned centroid) for the given centroid set."""
    dists = F.array(*[_dist2(F.col(vec_col), c) for c in centroids])
    return df.withColumn("_d", dists).select(
        "*",
        F.array_position(F.col("_d"), F.array_min("_d")).cast("int").alias("cluster"),
        F.array_min("_d").alias("dist2"),
    ).drop("_d")


def lloyd_kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[float], list[list[float]]]:
    """Run ``iterations`` Lloyd rounds; returns (assigned_df, inertia
    history [one entry per round, BEFORE that round's update], final
    centroids).

    Init is deterministic: the k vectors with the smallest ``id_col``.
    An empty cluster keeps its previous centroid (documented; k is
    expected ≪ n so this is a degenerate-input escape hatch, not a
    steady-state path).
    """
    if k < 1 or iterations < 1:
        raise ValueError(f"k={k} iterations={iterations} must be >= 1")
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init) < k:
        raise ValueError(f"need >= k={k} rows, got {len(init)}")
    centroids = [[float(x) for x in r[0]] for r in init]
    dim = len(centroids[0])

    history: list[float] = []
    for _ in range(iterations):
        assigned = assign_clusters(df, centroids, vec_col)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("dist2").alias("d2"),
                *[
                    F.sum(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        history.append(sum(r["d2"] for r in stats))
        new_centroids = list(centroids)  # empty cluster -> keep old
        for r in stats:
            new_centroids[r["cluster"] - 1] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        centroids = new_centroids

    return assign_clusters(df, centroids, vec_col), history, centroids
