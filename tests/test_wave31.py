"""Wave-31 unit/property tests: k-anonymity profile vs a Counter
re-derivation, freshness lag laws, and negative-sampling conservation
+ hashlib replay."""

import hashlib
from collections import Counter

import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs31 import (
    _NEG_K,
    q_data_freshness,
    q_k_anonymity,
    q_negative_sampling,
)


def test_k_anonymity_matches_counter(spark, sf_dir):
    c = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    cents = (c["c_acctbal"] * 100).round().astype("int64")
    # both engines' integer division truncates toward zero (measured:
    # DuckDB (-150)//100 = -1, Spark DIV likewise); python // floors
    c["bal_bucket"] = cents.map(
        lambda v: v // 100000 if v >= 0 else -((-v) // 100000)
    )
    sizes = Counter(
        zip(c["c_nationkey"].values, c["c_mktsegment"].values, c["bal_bucket"].values)
    )
    rows = q_k_anonymity(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_groups"] == len(sizes)
    assert r["n_rows"] == len(c)
    assert r["min_group"] == min(sizes.values())
    for k in (2, 5, 10):
        assert r[f"groups_lt_{k}"] == sum(1 for v in sizes.values() if v < k)
        assert r[f"rows_lt_{k}"] == sum(v for v in sizes.values() if v < k)
    # profile monotone in k
    assert r["groups_lt_2"] <= r["groups_lt_5"] <= r["groups_lt_10"]


def test_data_freshness_laws(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"]).to_pandas()
    ev["es"] = ev["ts"].map(lambda t: int(t.value // 10**9))
    gmax = int(ev["es"].max())
    rows = {r["event_type"]: r for r in q_data_freshness(spark, sf_dir).collect()}
    assert set(rows) == set(ev["event_type"].unique())
    lags = []
    for etype, g in ev.groupby("event_type"):
        r = rows[etype]
        assert r["n_events"] == len(g)
        assert r["last_es"] == int(g["es"].max())
        assert r["lag_s"] == gmax - int(g["es"].max())
        assert r["n_last_day"] == int((g["es"] >= gmax - 86400).sum())
        lags.append(r["lag_s"])
    # the freshest feed defines the clock: at least one zero lag
    assert min(lags) == 0


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_negative_sampling_conservation_and_replay(spark, sf_dir):
    o = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]).to_pandas()
    li = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]).to_pandas()
    p = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"]).to_pandas()
    lo, hi = int(p["p_partkey"].min()), int(p["p_partkey"].max())
    pos = set(
        zip(
            li.merge(o, left_on="l_orderkey", right_on="o_orderkey")["o_custkey"],
            li.merge(o, left_on="l_orderkey", right_on="o_orderkey")["l_partkey"],
        )
    )
    custs = sorted(set(o["o_custkey"]))
    hits = 0
    for cu in custs:
        for i in range(1, _NEG_K + 1):
            cand = lo + _h32(f"{cu}:{i}") % (hi - lo + 1)
            if (cu, cand) in pos:
                hits += 1
    rows = q_negative_sampling(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_customers"] == len(custs)
    assert r["n_candidates"] == len(custs) * _NEG_K
    assert r["n_hit_positive"] == hits
    # conservation: every candidate is a negative XOR a positive hit
    assert r["n_negatives"] + r["n_hit_positive"] == r["n_candidates"]
