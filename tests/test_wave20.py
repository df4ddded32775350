"""Wave-20 unit/property tests: distinctive-term lift laws and pandas
re-derivation, rolling-slope vs NumPy polyfit per frame, funnel
latencies vs the event replay, and skew-profile identities."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs20 import (
    _DT_MIN_COUNT,
    _DT_TOPK,
    q_distinctive_terms,
    q_funnel_latency,
    q_rolling_slope,
    q_skew_profile,
)


def _tokens(sf_dir):
    import re

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    rows = []
    for _, r in docs.iterrows():
        norm = re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).strip()
        for w in norm.split(" "):
            if w:
                rows.append((r["source"], w))
    return pd.DataFrame(rows, columns=["source", "w"])


def test_distinctive_terms_matches_pandas(spark, sf_dir):
    tok = _tokens(sf_dir)
    st = tok.groupby(["source", "w"]).size().rename("c_st").reset_index()
    t_s = st.groupby("source")["c_st"].sum()
    c_t = st.groupby("w")["c_st"].sum()
    t_all = st["c_st"].sum()
    st = st[st["c_st"] >= _DT_MIN_COUNT].copy()
    st["lift"] = (st["c_st"] * t_all).astype(float) / (
        st["source"].map(t_s) * st["w"].map(c_t)
    ).astype(float)
    exp = {}
    for src, g in st.groupby("source"):
        ranked = g.sort_values(["lift", "w"], ascending=[False, True]).head(_DT_TOPK)
        exp[src] = list(zip(ranked["w"], ranked["c_st"], ranked["lift"]))
    got = {}
    for r in q_distinctive_terms(spark, sf_dir).collect():
        got.setdefault(r["source"], []).append((r["token"], r["c_st"], r["lift"]))
    assert got == exp


def test_distinctive_lift_mass_law(spark, sf_dir):
    # a token appearing ONLY in one source has lift == T / T_s there
    pdf = q_distinctive_terms(spark, sf_dir).toPandas()
    assert (pdf["lift"] > 0).all()
    assert pdf.groupby("source")["rank"].apply(
        lambda s: list(s) == list(range(1, len(s) + 1))
    ).all()


def test_rolling_slope_matches_polyfit(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    day = ev["ts"].map(lambda d: int(d.timestamp()) // 86400)
    d = (
        ev.assign(day=day)
        .groupby(["event_type", "day"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    got = {
        (r["event_type"], r["day"]): r["slope"]
        for r in q_rolling_slope(spark, sf_dir).collect()
    }
    for et, g in d.groupby("event_type"):
        g = g.reset_index(drop=True)
        for i in range(len(g)):
            fr = g.iloc[max(0, i - 3) : i + 4]
            x = fr["day"].values.astype(float)
            y = fr["n"].values.astype(float)
            if len(fr) < 2:
                continue
            slope = np.polyfit(x, y, 1)[0]
            assert abs(got[(et, int(g.loc[i, "day"]))] - slope) < 1e-6


def test_funnel_latency_matches_replay(spark, sf_dir):
    ev = (
        pq.read_table(f"{sf_dir}/events.parquet")
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    lat1, lat2 = [], []
    for _, g in ev.groupby("user_id"):
        seen_view = seen_qc = False
        fv = fqc = fqp = None
        for t, ts in zip(g["event_type"], g["ts"]):
            es = int(ts.timestamp())
            is_qc = t == "click" and seen_view
            if t == "view" and fv is None:
                fv = es
            if is_qc and fqc is None:
                fqc = es
            if t == "purchase" and seen_qc and fqp is None:
                fqp = es
            seen_view = seen_view or t == "view"
            seen_qc = seen_qc or is_qc
        if fqc is not None:
            lat1.append(fqc - fv)
        if fqp is not None:
            lat2.append(fqp - fqc)
    got = {r["transition"]: r for r in q_funnel_latency(spark, sf_dir).collect()}
    assert got["view_to_click"]["n_users"] == len(lat1)
    assert got["click_to_purchase"]["n_users"] == len(lat2)
    assert got["view_to_click"]["max_s"] == max(lat1)
    assert got["click_to_purchase"]["max_s"] == max(lat2)
    assert abs(got["view_to_click"]["p50_s"] - np.percentile(lat1, 50)) < 1e-9
    assert abs(got["click_to_purchase"]["p90_s"] - np.percentile(lat2, 90)) < 1e-9


def test_skew_profile_identities(spark, sf_dir):
    rows = {r["key_name"]: r for r in q_skew_profile(spark, sf_dir).collect()}
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    c = li.groupby("l_orderkey").size()
    r = rows["lineitem.l_orderkey"]
    assert r["n_keys"] == len(c)
    assert r["n_rows"] == len(li)
    assert r["max_cnt"] == c.max()
    assert r["p50_cnt"] == np.percentile(c.values, 50)
    assert r["top_share"] == c.max() / len(li)
    assert r["skew_ratio"] == (c.max() * len(c)) / len(li)
    for r in rows.values():
        assert r["skew_ratio"] >= 1.0
        assert 0 < r["top_share"] <= 1.0
