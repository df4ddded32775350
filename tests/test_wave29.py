"""Wave-29 unit/property tests: Fano/CV vs NumPy population moments,
drawdown vs a running-max replay, CDF probe monotonicity + exact
counts, and rank-shift vs a Counter-ranked re-derivation."""

import re
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs29 import (
    _CDF_PROBES_CENTS,
    _RANK_SHIFT_K,
    q_burstiness,
    q_cdf_probes,
    q_max_drawdown,
    q_rank_shift,
)

_EPOCH_DAY = lambda t: int(t.value // 10**9) // 86400  # noqa: E731


def test_burstiness_matches_numpy(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"]).to_pandas()
    ev["day"] = ev["ts"].map(_EPOCH_DAY)
    rows = {r["event_type"]: r for r in q_burstiness(spark, sf_dir).collect()}
    for etype, g in ev.groupby("event_type"):
        counts = g.groupby("day").size().values.astype(float)
        r = rows[etype]
        assert r["n_days"] == len(counts)
        assert r["total_events"] == int(counts.sum())
        var_pop = counts.var()  # numpy population variance
        mean = counts.mean()
        assert abs(r["fano"] - var_pop / mean) < 1e-9
        assert abs(r["cv"] - np.sqrt(var_pop) / mean) < 1e-9
        assert r["fano"] >= 0 and r["cv"] >= 0


def test_drawdown_matches_replay(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    ).to_pandas()
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["day"] = j["o_orderdate"].map(_EPOCH_DAY)
    j["cents"] = (j["o_totalprice"] * 100).round().astype("int64")
    rows = {r["c_mktsegment"]: r for r in q_max_drawdown(spark, sf_dir).collect()}
    for seg, g in j.groupby("c_mktsegment"):
        daily = g.groupby("day")["cents"].sum().sort_index()
        peak, best, trough_day = None, None, None
        for day, rev in daily.items():
            peak = rev if peak is None else max(peak, rev)
            dd = peak - rev
            # strict > keeps the FIRST (smallest) day attaining the max
            if best is None or dd > best:
                best, trough_day = dd, day
        r = rows[seg]
        assert r["max_drawdown_cents"] == best
        assert r["trough_day"] == trough_day
        assert best >= 0


def test_cdf_probes_exact_and_monotone(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j["o_totalprice"] * 100).round().astype("int64")
    rows = {r["c_mktsegment"]: r for r in q_cdf_probes(spark, sf_dir).collect()}
    for seg, g in j.groupby("c_mktsegment"):
        r = rows[seg]
        assert r["n"] == len(g)
        for lbl, lim in zip(("5k", "15k", "30k"), _CDF_PROBES_CENTS):
            exact = int((g["cents"] <= lim).sum())
            assert r[f"n_le_{lbl}"] == exact
            assert r[f"cdf_{lbl}"] == float(exact) / float(len(g))
        assert r["cdf_5k"] <= r["cdf_15k"] <= r["cdf_30k"] <= 1.0


def test_rank_shift_matches_counter(spark, sf_dir):
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    mid = (int(docs["doc_id"].min()) + int(docs["doc_id"].max())) // 2
    counters = {1: Counter(), 2: Counter()}
    for r in docs.itertuples():
        norm = re.sub(r"[^a-z0-9]+", " ", r.text.lower()).strip()
        toks = [t for t in norm.split(" ") if t]
        counters[1 if r.doc_id <= mid else 2].update(toks)
    ranks = {}
    for half, cnt in counters.items():
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        ranks[half] = {t: (i + 1, n) for i, (t, n) in enumerate(ordered)}
    exp = {}
    for t in set(ranks[1]) & set(ranks[2]):
        r1, c1 = ranks[1][t]
        r2, c2 = ranks[2][t]
        if r1 <= _RANK_SHIFT_K or r2 <= _RANK_SHIFT_K:
            exp[t] = (r1, r2, c1, c2, r1 - r2)
    got = {
        r["token"]: (
            r["rank_h1"],
            r["rank_h2"],
            r["count_h1"],
            r["count_h2"],
            r["rank_gain"],
        )
        for r in q_rank_shift(spark, sf_dir).collect()
    }
    assert got == exp
