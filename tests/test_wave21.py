"""Wave-21 unit/property tests: ship-delay vs a pandas join, gap
stats vs a per-(type, day) pandas replay, dup-rate identities vs
hashlib fingerprints, and the epoch-day weekday arithmetic vs
Python's calendar."""

import hashlib
import re

import numpy as np
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs21 import (
    q_dow_profile,
    q_dup_rate_by_source,
    q_interarrival_stats,
    q_ship_delay,
)


def test_ship_delay_matches_pandas(spark, sf_dir):
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    o = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    delay = j["l_shipdate"].map(lambda d: int(d.timestamp()) // 86400) - j[
        "o_orderdate"
    ].map(lambda d: int(d.timestamp()) // 86400)
    j = j.assign(delay=delay)
    got = {r["o_orderpriority"]: r for r in q_ship_delay(spark, sf_dir).collect()}
    for pri, g in j.groupby("o_orderpriority"):
        r = got[pri]
        assert r["n_lines"] == len(g)
        assert r["max_days"] == g["delay"].max()
        assert r["mean_days"] == g["delay"].sum() / len(g)
        assert abs(r["p50_days"] - np.percentile(g["delay"].values, 50)) < 1e-9
        assert abs(r["p90_days"] - np.percentile(g["delay"].values, 90)) < 1e-9
    assert set(got) == set(j["o_orderpriority"])


def test_interarrival_matches_replay(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    es = ev["ts"].map(lambda d: int(d.timestamp()))
    ev = ev.assign(es=es, day=es // 86400).sort_values(["es", "event_id"])
    gaps = {}
    for (et, _), g in ev.groupby(["event_type", "day"]):
        d = np.diff(g["es"].values)
        gaps.setdefault(et, []).extend(d.tolist())
    got = {r["event_type"]: r for r in q_interarrival_stats(spark, sf_dir).collect()}
    assert set(got) == set(gaps)
    for et, gs in gaps.items():
        r = got[et]
        assert r["n_gaps"] == len(gs)
        assert r["max_s"] == max(gs)
        assert r["mean_s"] == sum(gs) / len(gs)
        assert abs(r["p50_s"] - np.percentile(gs, 50)) < 1e-9


def test_dup_rate_matches_hashlib(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    norm = docs["text"].map(
        lambda t: re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
    )
    docs = docs.assign(fp=norm.map(lambda t: hashlib.md5(t.encode()).hexdigest()))
    got = {r["source"]: r for r in q_dup_rate_by_source(spark, sf_dir).collect()}
    for src, g in docs.groupby("source"):
        r = got[src]
        assert r["n_docs"] == len(g)
        assert r["n_unique"] == g["fp"].nunique()
        assert r["n_dups"] == len(g) - g["fp"].nunique()
        assert r["dup_rate"] == (len(g) - g["fp"].nunique()) / len(g)


def test_dow_profile_matches_calendar(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    # python isoweekday on the UTC date must agree with the modular form
    dow = ev["ts"].map(lambda d: d.isoweekday())
    exp = ev.assign(dow=dow).groupby(["event_type", "dow"]).size()
    rows = q_dow_profile(spark, sf_dir).collect()
    got = {(r["event_type"], r["dow_iso"]): r["n"] for r in rows}
    assert got == {k: int(v) for k, v in exp.items()}
    # shares sum to 1 per type; lift is share*7
    for r in rows:
        assert r["lift_vs_uniform"] == r["share"] * 7 or abs(
            r["lift_vs_uniform"] - r["share"] * 7
        ) < 1e-12
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], 0.0)
        by_type[r["event_type"]] += r["share"]
    assert all(abs(s - 1.0) < 1e-9 for s in by_type.values())
