"""Wave-22 unit/property tests: HHI identities vs pandas, Pareto cut
laws, containment asymmetry/range laws vs a Python set re-derivation,
and anomaly z-scores vs NumPy."""

import re

import numpy as np
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs22 import (
    q_anomaly_days,
    q_hhi_by_segment,
    q_ngram_containment,
    q_pareto_coverage,
)


def test_hhi_matches_pandas(spark, sf_dir):
    o = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    c = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j["o_totalprice"] * 100).round().astype("int64")
    pc = (
        j.groupby(["c_mktsegment", "o_custkey"])["cents"].sum() // 100
    ).rename("dollars").reset_index()
    got = {r["c_mktsegment"]: r for r in q_hhi_by_segment(spark, sf_dir).collect()}
    for seg, g in pc.groupby("c_mktsegment"):
        d = g["dollars"].values.astype(object)  # exact python ints
        sd, sdd = int(sum(d)), int(sum(x * x for x in d))
        r = got[seg]
        assert r["n_cust"] == len(d)
        assert r["total_dollars"] == sd
        assert abs(r["hhi"] - sdd / sd**2) < 1e-12
        assert abs(r["effective_n"] - sd**2 / sdd) < 1e-6
        # HHI bounds: 1/n <= hhi <= 1
        assert 1.0 / len(d) <= r["hhi"] <= 1.0


def test_pareto_coverage_laws(spark, sf_dir):
    o = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    pc = o.groupby("o_custkey")["cents"].sum().sort_values(ascending=False)
    cum = pc.cumsum()
    total = pc.sum()
    n_top_exp = int(np.argmax(5 * cum.values >= 4 * total)) + 1
    r = q_pareto_coverage(spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_top"] == n_top_exp
    assert r["n_customers"] == len(pc)
    assert r["base_share"] == n_top_exp / len(pc)
    assert r["cum_share"] >= 0.8
    # minimality: one customer fewer falls below 80%
    if n_top_exp > 1:
        assert 5 * int(cum.values[n_top_exp - 2]) < 4 * int(total)


def _gram_sets(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    sets = {}
    for _, r in docs.iterrows():
        t = re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).strip()
        gs = {t} if len(t) < 3 else {t[i : i + 3] for i in range(len(t) - 2)}
        sets.setdefault(r["source"], set()).update(gs)
    return sets


def test_containment_matches_sets(spark, sf_dir):
    sets = _gram_sets(sf_dir)
    got = {
        (r["src_a"], r["src_b"]): r
        for r in q_ngram_containment(spark, sf_dir).collect()
    }
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_inter"] == inter
            assert r["size_a"] == len(sets[a])
            assert r["containment"] == inter / len(sets[a])
    # symmetry of the intersection, asymmetry of the containment
    for (a, b), r in got.items():
        assert got[(b, a)]["n_inter"] == r["n_inter"]


def test_anomaly_days_matches_numpy(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    day = ev["ts"].map(lambda d: int(d.timestamp()) // 86400)
    d = ev.assign(day=day).groupby(["event_type", "day"]).size().rename("n")
    exp = set()
    for et in d.index.get_level_values(0).unique():
        g = d[et]
        mu, sigma = g.mean(), g.std(ddof=0)
        if sigma == 0:
            continue
        for dy, n in g.items():
            if abs((n - mu) / sigma) > 2:
                exp.add((et, int(dy)))
    got = {
        (r["event_type"], r["day"]) for r in q_anomaly_days(spark, sf_dir).collect()
    }
    assert got == exp
