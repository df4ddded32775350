"""KMV sketch tests: exactness below k, estimator accuracy above k, and
the mergeability property that makes it a valid partial aggregate."""

import hashlib

from books2scrape_etl_spark.operators.sketch import kmv_distinct


def _h(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 40,) for i in range(400)], "key long")
    row = kmv_distinct(df, "key", k=256).collect()[0]
    assert row.k_used == 40
    assert row.est_dv == 40.0  # sketch not full -> exact by construction
    assert row.exact_dv == 40


def test_kmv_estimate_accuracy_above_k(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "key long")
    row = kmv_distinct(df, "key", k=256).collect()[0]
    assert row.k_used == 256
    assert row.exact_dv == n
    assert abs(row.est_dv - n) / n < 0.15  # ~1/sqrt(255) ≈ 6% expected
    # kth_hash is the true 256th smallest md5-prefix hash
    assert row.kth_hash == sorted(_h(i) for i in range(n))[255]


def test_kmv_merge_property(spark):
    # merge(A, B) = k smallest of (union of the two sketches) must equal
    # the sketch of A ∪ B — KMV's partial-aggregate law.
    k = 64
    a_keys = list(range(0, 3000))
    b_keys = list(range(1500, 4500))  # overlapping halves
    sk = {}
    for name, keys in (("a", a_keys), ("b", b_keys)):
        df = spark.createDataFrame([(x,) for x in keys], "key long")
        rows = kmv_distinct(df, "key", k=k).collect()[0]
        # re-derive the full k-min set locally for the merge check
        sk[name] = sorted({_h(x) for x in keys})[:k]
        assert rows.kth_hash == sk[name][-1]
    merged = sorted(set(sk["a"]) | set(sk["b"]))[:k]
    union_df = spark.createDataFrame(
        [(x,) for x in set(a_keys) | set(b_keys)], "key long"
    )
    union_row = kmv_distinct(union_df, "key", k=k).collect()[0]
    assert union_row.kth_hash == merged[-1]


def test_kmv_grouped(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = kmv_distinct(li, "l_orderkey", ["l_returnflag"], k=256).collect()
    assert {r.l_returnflag for r in rows} == {"A", "N", "R"}
    for r in rows:
        if r.k_used < 256:
            assert r.est_dv == float(r.exact_dv)
        else:
            assert abs(r.est_dv - r.exact_dv) / r.exact_dv < 0.2


def test_kmv_set_ops_estimates(spark):
    """Union/intersection estimates from the two sketches alone must
    track the true overlap: A = 0..2999, B = 1500..4499 -> union 4500,
    intersection 1500 (Jaccard 1/3)."""
    from books2scrape_etl_spark.operators.sketch import kmv_set_ops

    rows = [("a", x) for x in range(0, 3000)] + [("b", x) for x in range(1500, 4500)]
    df = spark.createDataFrame(rows, "lab string, key long")
    (r,) = kmv_set_ops(df, "key", "lab", "a", "b", k=128).collect()
    assert r.k_a == r.k_b == r.k_u == 128
    assert r.exact_union == 4500 and r.exact_inter == 1500
    # ~1/sqrt(127) ≈ 9% expected; allow 3 sigma
    assert abs(r.est_union - 4500) / 4500 < 0.3
    assert abs(r.est_jaccard - 1 / 3) < 0.15
    assert abs(r.est_intersection - 1500) / 1500 < 0.45
    # union sketch boundary is the true 128th smallest hash of A∪B
    import hashlib

    def h(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)

    assert r.kth_u == sorted(h(x) for x in range(4500))[127]
