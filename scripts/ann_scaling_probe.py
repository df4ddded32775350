"""Scaling probe for the ANN stack: brute-force vs IVF cost and recall
as the corpus grows.

Blows up the sf0.1 embeddings table by self-union with deterministic
per-replica rotations (replicas are distinct vectors, not copies) and,
for a fixed 16-query panel, times brute_force_topk and ivf_topk
(n_lists=32, n_probe=4, quantizer trained once per factor on a 25%
sample) at 1x/4x/16x, measuring IVF recall@10 against the brute
result. The 100 TB claim being tested: brute cost grows linearly with
the corpus while IVF candidate cost grows ~n_probe/n_lists as fast,
at a recall floor the banding math predicts.

    python scripts/ann_scaling_probe.py     # one JSON line
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
)
from books2scrape_etl_spark.queries import freeze_registry_heap
from books2scrape_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (16, 64, 256)
K = 10
N_LISTS = 32
N_PROBE = 4


def blowup(emb, factor: int):
    """crossJoin `factor` deterministically rotated replicas (2-D
    Givens rotation on dim pairs (2i, 2i+1) by a replica-specific
    angle keeps norms and makes every replica a distinct vector) — one
    plan shape at any factor, so 256x costs a scan, not 256 unions."""
    if factor == 1:
        return emb
    reps = emb.sparkSession.range(factor).select(F.col("id").alias("rep"))
    rot = F.expr(
        "transform(sequence(0, size(embedding) - 1), j -> CAST("
        " CASE WHEN rep = 0 THEN element_at(embedding, j + 1)"
        "      WHEN j % 2 = 0 THEN cos(0.37 * rep) * element_at(embedding, j + 1)"
        "        - sin(0.37 * rep) * element_at(embedding, j + 2)"
        "      ELSE sin(0.37 * rep) * element_at(embedding, j)"
        "        + cos(0.37 * rep) * element_at(embedding, j + 1) END AS FLOAT))"
    )
    return (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            rot.alias("embedding"),
        )
        .repartition(32)
    )


def main() -> None:
    freeze_registry_heap()
    spark = get_spark(app_name="ann_scaling_probe")
    emb0 = read_table(spark, "embeddings", SF_DIR).select("vec_id", "embedding")
    queries = (
        emb0.orderBy("vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    queries.persist().count()
    results: dict = {"sf": SF_DIR, "k": K, "n_lists": N_LISTS, "n_probe": N_PROBE,
                     "factors": {}}
    from pyspark.sql import Window

    from books2scrape_etl_spark.operators.similarity import (
        cosine,
        ivf_assign,
        ivf_probe_lists,
    )

    for f in FACTORS:
        emb = blowup(emb0, f).persist()
        n = emb.count()
        t0 = time.time()
        brute = brute_force_topk(emb, queries, k=K)
        truth = {(r["q_id"], r["vec_id"]) for r in brute.collect()}
        t_brute = round(time.time() - t0, 2)
        # --- the ivf_topk docstring contract: train once, index once,
        # serve — index-build cost is timed apart from the serve path
        t0 = time.time()
        centers = kmeans_centroids(emb, N_LISTS, seed=7, train_fraction=0.25)
        t_train = round(time.time() - t0, 2)
        t0 = time.time()
        indexed = emb.withColumn(
            "list_id", ivf_assign(F.col("embedding"), centers)
        ).persist()
        indexed.count()
        t_index = round(time.time() - t0, 2)
        t0 = time.time()
        q = queries.withColumn(
            "list_id", F.explode(ivf_probe_lists(F.col("q_vec"), centers, N_PROBE))
        )
        cand = indexed.join(F.broadcast(q), on="list_id").where(
            F.col("vec_id") != F.col("q_id")
        )
        scored = cand.select(
            "q_id", "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("cos_sim"),
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id").asc()
        )
        approx = scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= K
        )
        got = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
        t_serve = round(time.time() - t0, 2)
        indexed.unpersist()
        emb.unpersist()
        recall = round(len(truth & got) / max(len(truth), 1), 4)
        results["factors"][str(f)] = {
            "n_vecs": n, "brute_s": t_brute, "ivf_train_s": t_train,
            "ivf_index_s": t_index, "ivf_serve_s": t_serve,
            "recall_at_10": recall,
        }
        print(f"factor {f}: n={n} brute={t_brute}s train={t_train}s "
              f"index={t_index}s serve={t_serve}s recall@10={recall}",
              file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
