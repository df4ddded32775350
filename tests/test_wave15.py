"""Wave-15 unit/property tests: BFS distances vs a pure-Python BFS,
RFM quintile-size / segment-decomposition laws, Benford digit
extraction and share-mass conservation, the HLL error-bound flag, the
KS statistic vs a NumPy re-derivation (plus the prefix_sums_scale ==
exact-window law), and the distributed Gram matrix vs a full-data
NumPy Gram."""

import math
from collections import deque

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.query_defs15 import (
    _BENFORD,
    _BFS_HOPS,
    _KS_C_ALPHA,
    q_benford_digits,
    q_graph_bfs,
    q_hll_distinct,
    q_ks_test,
    q_pca_gram,
    q_rfm_segments,
)

# ------------------------------------------------------------- graph_bfs


def test_graph_bfs_matches_python_bfs(spark, sf_dir):
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    adj = {}
    for _, basket in li.groupby("l_orderkey")["l_partkey"]:
        items = sorted(set(basket))
        for i, u in enumerate(items):
            for v in items[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    seeds = sorted(adj)[:3]
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= _BFS_HOPS:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    from collections import Counter

    expected = Counter(dist.values())
    rows = {r["dist"]: r for r in q_graph_bfs(spark, sf_dir).collect()}
    assert {d: r["n_nodes"] for d, r in rows.items()} == dict(expected)
    for d, r in rows.items():
        level = [n for n, dd in dist.items() if dd == d]
        assert r["min_node"] == min(level) and r["max_node"] == max(level)


# ------------------------------------------------------------- rfm_segments


def test_rfm_quintiles_are_balanced_and_segments_decompose(spark, sf_dir):
    rows = q_rfm_segments(spark, sf_dir).collect()
    n = sum(r["n_cust"] for r in rows)
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    assert n == orders["o_custkey"].nunique()
    # each digit of every segment code is a valid quintile 1..5
    per_digit = {0: {}, 1: {}, 2: {}}
    for r in rows:
        seg = r["segment"]
        digs = (seg // 100, (seg // 10) % 10, seg % 10)
        assert all(1 <= d <= 5 for d in digs)
        for i, d in enumerate(digs):
            per_digit[i][d] = per_digit[i].get(d, 0) + r["n_cust"]
    # ntile law: each quintile holds floor(n/5) or ceil(n/5) customers
    lo, hi = n // 5, -(-n // 5)
    for i in range(3):
        assert sum(per_digit[i].values()) == n
        assert all(lo <= c <= hi for c in per_digit[i].values())
    # avg_cents is exactly total/count as doubles
    for r in rows:
        assert r["avg_cents"] == float(r["total_cents"]) / float(r["n_cust"])


# ---------------------------------------------------------- benford_digits


def test_benford_digit_extraction_and_mass(spark, sf_dir):
    rows = q_benford_digits(spark, sf_dir).collect()
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cents = (
        orders["o_totalprice"].round(2).mul(100).round().astype("int64")
    )
    cents = cents[cents >= 1]
    expected = cents.astype(str).str[0].astype(int).value_counts().to_dict()
    got = {r["digit"]: r["n_obs"] for r in rows}
    assert got == expected
    assert abs(sum(r["share_obs"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r["share_exp"] == _BENFORD[r["digit"]]
        d = r["share_obs"] - r["share_exp"]
        assert r["chi_cell"] == d * d / r["share_exp"]


def test_benford_expected_shares_sum_to_one():
    assert abs(sum(_BENFORD.values()) - 1.0) < 1e-12


# ------------------------------------------------------------ hll_distinct


def test_hll_within_bound_everywhere(spark, sf_dir):
    rows = q_hll_distinct(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["within_bound"] == 1 for r in rows)


# ----------------------------------------------------------------- ks_test


def test_ks_stat_matches_numpy(spark, sf_dir):
    row = q_ks_test(spark, sf_dir).collect()[0]
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    g1, g2 = sorted(ev["event_type"].unique())[:2]
    a = np.sort(ev.loc[ev["event_type"] == g1, "value"].values)
    b = np.sort(ev.loc[ev["event_type"] == g2, "value"].values)
    xs = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, xs, side="right") / len(a)
    f2 = np.searchsorted(b, xs, side="right") / len(b)
    d = np.abs(f1 - f2)
    assert row["g1"] == g1 and row["g2"] == g2
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert abs(row["d_stat"] - d.max()) < 1e-12
    # argmax tiebreak: smallest value attaining the max
    assert row["at_value"] == xs[d >= d.max() - 0.0][0] or math.isclose(
        d[xs == row["at_value"]][0], d.max()
    )
    crit = _KS_C_ALPHA * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert math.isclose(row["d_crit"], crit, rel_tol=1e-12)
    assert row["reject"] == (1 if row["d_stat"] > row["d_crit"] else 0)


def test_prefix_sums_scale_equals_exact_window(spark):
    from books2scrape_etl_spark.operators.scale import prefix_sums_scale

    df = spark.range(0, 997).select(
        (F.col("id") * 37 % 997).alias("k"),
        (F.col("id") % 7).cast("long").alias("a"),
        (F.col("id") % 3).cast("long").alias("b"),
    )
    got = (
        prefix_sums_scale(df, ["k"], ["a", "b"], num_partitions=13)
        .select("k", "cum_a", "cum_b")
        .collect()
    )
    w = (
        Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = (
        df.select("k", F.sum("a").over(w).alias("cum_a"), F.sum("b").over(w).alias("cum_b"))
        .collect()
    )
    key = lambda r: r["k"]
    assert sorted([tuple(r) for r in got], key=lambda t: t[0]) == sorted(
        [tuple(r) for r in exp], key=lambda t: t[0]
    )


# ---------------------------------------------------------------- pca_gram


def test_pca_invariants_all_pass(spark, sf_dir):
    rows = q_pca_gram(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["ok"] == 1 for r in rows)


def test_distributed_gram_matches_numpy(spark, sf_dir):
    import pandas as pd

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    g_ref = x.T @ x

    from books2scrape_etl_spark.io import read_table

    sdf = read_table(spark, "embeddings", None or f"{sf_dir}").select("embedding")

    def partial_gram(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xx = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            gg = xx.T @ xx
            iu = np.triu_indices(gg.shape[0])
            yield pd.DataFrame(
                {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"), "val": gg[iu]}
            )

    rows = (
        sdf.mapInPandas(partial_gram, "i int, j int, val double")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    g = np.zeros_like(g_ref)
    for r in rows:
        g[r["i"], r["j"]] = r["val"]
        g[r["j"], r["i"]] = r["val"]
    assert np.allclose(g, g_ref, rtol=1e-9, atol=1e-9)
