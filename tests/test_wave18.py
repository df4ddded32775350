"""Wave-18 unit/property tests: k-NN confusion matrix vs a NumPy
re-derivation (cosine kernel, vote, tie rules), confusion-mass
conservation, and the class-weight balance law (sum over the dataset
of each row's weight equals N)."""

import math
from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs18 import (
    _KNN_K,
    _KNN_QUERY_MOD,
    q_class_weights,
    q_knn_confusion,
)


def _emb(sf_dir):
    pdf = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    return pdf["vec_id"].values, x, pdf["label"].values


def test_knn_confusion_matches_numpy(spark, sf_dir):
    ids, x, labels = _emb(sf_dir)
    norms = np.linalg.norm(x, axis=1)
    expected = Counter()
    for qi in range(len(ids)):
        if ids[qi] % _KNN_QUERY_MOD != 0:
            continue
        cos = (x @ x[qi]) / (norms * norms[qi])
        cos = np.round(cos, 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-cos[i], ids[i]),
        )[:_KNN_K]
        votes = Counter(labels[i] for i in order)
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        expected[(int(labels[qi]), int(pred))] += 1
    got = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in q_knn_confusion(spark, sf_dir).collect()
    }
    assert got == dict(expected)


def test_knn_confusion_mass_is_query_count(spark, sf_dir):
    ids, _, _ = _emb(sf_dir)
    n_queries = int((ids % _KNN_QUERY_MOD == 0).sum())
    rows = q_knn_confusion(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == n_queries


def test_class_weights_balance_law(spark, sf_dir):
    rows = q_class_weights(spark, sf_dir).collect()
    _, _, labels = _emb(sf_dir)
    counts = Counter(int(v) for v in labels)
    assert {r["label"]: r["n"] for r in rows} == dict(counts)
    total = sum(counts.values())
    k = len(counts)
    for r in rows:
        assert math.isclose(r["weight"], total / (k * r["n"]), rel_tol=1e-12)
    # the balance law: sum over all ROWS of their class weight == N
    mass = sum(r["n"] * r["weight"] for r in rows)
    assert math.isclose(mass, total, rel_tol=1e-12)
