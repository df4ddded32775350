"""Wave-27 unit/property tests: rate-limit cap laws vs a hashlib
replay, TTR identities vs a Counter re-derivation, group-split
disjointness/determinism, and 2-D histogram mass conservation."""

import hashlib
import re
from collections import Counter

import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs27 import (
    _RATE_K,
    q_group_split,
    q_histogram_2d,
    q_rate_limit_keys,
    q_ttr_stats,
)


def _md5_int(s, n):
    return int(hashlib.md5(str(s).encode()).hexdigest()[:n], 16)


def test_rate_limit_matches_replay(spark, sf_dir):
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "event_id"]
    ).to_pandas()
    ev["hk"] = ev["event_id"].map(lambda e: _md5_int(e, 15))
    exp_before = ev["event_type"].value_counts().to_dict()
    exp_after = Counter()
    for _, g in ev.groupby("user_id"):
        keep = g.sort_values(["hk", "event_id"], ascending=False).head(_RATE_K)
        exp_after.update(keep["event_type"].values)
    rows = q_rate_limit_keys(spark, sf_dir).collect()
    for r in rows:
        assert r["n_before"] == exp_before[r["event_type"]]
        assert r["n_after"] == exp_after[r["event_type"]]
        assert r["n_after"] <= r["n_before"]
        assert r["keep_share"] == float(r["n_after"]) / float(r["n_before"])
    # global cap law: no user exceeds K kept events
    assert sum(exp_after.values()) <= ev["user_id"].nunique() * _RATE_K


def test_ttr_matches_counter(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    per_source = {}
    for r in docs.itertuples():
        norm = re.sub(r"[^a-z0-9]+", " ", r.text.lower()).strip()
        toks = [t for t in norm.split(" ") if t]
        per_source.setdefault(r.source, Counter()).update(toks)
    rows = {r["source"]: r for r in q_ttr_stats(spark, sf_dir).collect()}
    assert set(rows) == set(per_source)
    for src, c in per_source.items():
        r = rows[src]
        total, distinct = sum(c.values()), len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        assert (r["total_tokens"], r["distinct_tokens"], r["hapax_tokens"]) == (
            total,
            distinct,
            hapax,
        )
        assert r["ttr"] == float(distinct) / float(total)
        assert r["hapax_share"] == float(hapax) / float(distinct)
        assert 0 < r["ttr"] <= 1.0


def test_group_split_disjoint_and_deterministic(spark, sf_dir):
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    ).to_pandas()
    users = set(ev["user_id"])
    train_users = {u for u in users if 5 * _md5_int(u, 8) < 4 * 2**32}
    counts = ev["user_id"].value_counts()
    rows = {r["split"]: r for r in q_group_split(spark, sf_dir).collect()}
    assert rows["train"]["n_users"] == len(train_users)
    assert rows["test"]["n_users"] == len(users) - len(train_users)
    # leakage law: user partition => event counts split exactly
    assert rows["train"]["n_events"] == int(
        sum(counts[u] for u in train_users)
    )
    assert rows["train"]["n_events"] + rows["test"]["n_events"] == len(ev)


def test_histogram_2d_mass_and_bins(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice", "l_quantity"]
    ).to_pandas()
    cents = (li["l_extendedprice"] * 100).round().astype("int64")
    qty = li["l_quantity"].round().astype("int64")
    pb = (cents // 1_000_000).clip(upper=9)
    qb = (qty - 1) // 10
    exp = Counter(zip(pb.values, qb.values))
    rows = q_histogram_2d(spark, sf_dir).collect()
    got = {(r["price_bin"], r["qty_bin"]): r["n"] for r in rows}
    assert got == {k: v for k, v in exp.items()}
    assert sum(got.values()) == len(li)
    for r in rows:
        assert 0 <= r["price_bin"] <= 9 and 0 <= r["qty_bin"] <= 4
        assert r["share"] == float(r["n"]) / float(len(li))
