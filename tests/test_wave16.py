"""Wave-16 unit/property tests: linear interpolation laws (exactness
on observed hours, line membership on gaps, edge clamping), walk
validity (every hop is a real edge, hash-determinism replay), and
Welch's t vs a NumPy re-derivation."""

import hashlib
import math
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs16 import (
    _INTERP_USER_MOD,
    _WALK_SEEDS,
    _WALK_STEPS,
    q_graph_walks,
    q_ts_interp,
    q_welch_ttest,
)

# ------------------------------------------------------------- ts_interp


def _hourly(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev = ev[ev["user_id"] % _INTERP_USER_MOD == 0].copy()
    ev["es"] = ev["ts"].astype("int64") // 10**6
    ev["hour_es"] = ev["es"] - ev["es"] % 3600
    agg = (
        ev.groupby(["user_id", "hour_es"])["value"]
        .apply(lambda s: float(sum(round(v * 10000) for v in s)) / 10000.0)
        .to_dict()
    )
    return agg


def test_interp_observed_hours_pass_through_and_gaps_on_line(spark, sf_dir):
    rows = q_ts_interp(spark, sf_dir).collect()
    obs = _hourly(sf_dir)
    by_user = defaultdict(list)
    for (u, h) in obs:
        by_user[u].append(h)
    n_interp = 0
    for r in rows:
        key = (r["user_id"], r["hour_es"])
        if r["is_interp"] == 0:
            assert key in obs
            assert math.isclose(r["interp_value"], obs[key], rel_tol=1e-9)
        else:
            assert key not in obs
            n_interp += 1
            hours = sorted(by_user[r["user_id"]])
            prevs = [h for h in hours if h < r["hour_es"]]
            nexts = [h for h in hours if h > r["hour_es"]]
            # the grid spans [min, max] observed hours, so every gap
            # row is strictly interior: both neighbors exist
            assert prevs and nexts
            p, n = prevs[-1], nexts[0]
            pv, nv = obs[(r["user_id"], p)], obs[(r["user_id"], n)]
            expect = pv + (nv - pv) * ((r["hour_es"] - p) / (n - p))
            assert math.isclose(r["interp_value"], expect, rel_tol=1e-9)
    assert n_interp > 0  # the op actually exercised interpolation


def test_interp_grid_is_dense_per_user(spark, sf_dir):
    rows = q_ts_interp(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r["hour_es"])
    for u, hs in by_user.items():
        hs = sorted(hs)
        assert hs == list(range(hs[0], hs[-1] + 1, 3600))


# ------------------------------------------------------------ graph_walks


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_walks_follow_real_edges_and_replay_the_hash(spark, sf_dir):
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    adj = defaultdict(set)
    for _, basket in li.groupby("l_orderkey")["l_partkey"]:
        items = sorted(set(basket))
        for i, u in enumerate(items):
            for v in items[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    rows = q_graph_walks(spark, sf_dir).collect()
    assert len(rows) == _WALK_SEEDS * (_WALK_STEPS + 1)
    walks = defaultdict(dict)
    for r in rows:
        walks[r["seed"]][r["step"]] = r["node"]
    assert sorted(walks) == sorted(adj)[:_WALK_SEEDS]
    for seed, path in walks.items():
        assert path[0] == seed
        for t in range(_WALK_STEPS):
            here, nxt = path[t], path[t + 1]
            nbrs = sorted(adj[here])
            assert nxt == nbrs[_h32(f"{here}_{t}") % len(nbrs)]


# ------------------------------------------------------------ welch_ttest


def test_welch_matches_numpy(spark, sf_dir):
    row = q_welch_ttest(spark, sf_dir).collect()[0]
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    g1, g2 = sorted(ev["event_type"].unique())[:2]
    a = ev.loc[ev["event_type"] == g1, "value"].values
    b = ev.loc[ev["event_type"] == g2, "value"].values
    assert row["g1"] == g1 and row["g2"] == g2
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert math.isclose(row["mean1"], a.mean(), rel_tol=1e-9)
    assert math.isclose(row["var1"], a.var(ddof=1), rel_tol=1e-6)
    assert math.isclose(row["var2"], b.var(ddof=1), rel_tol=1e-6)
    se = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se)
    df = se * se / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert math.isclose(row["t_stat"], t, rel_tol=1e-6)
    assert math.isclose(row["df_welch"], df, rel_tol=1e-6)
    # Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert min(row["n1"], row["n2"]) - 1 <= row["df_welch"] <= row["n1"] + row["n2"] - 2
