"""Wave-24 unit/property tests: Spearman vs scipy-free exact
re-derivation, weighted counting quantiles vs a pandas replay,
MoM/YoY growth vs dict lookups (gap-correctness included), and the
deterministic mode tiebreak vs a Counter re-derivation."""

import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs24 import (
    q_growth_mom_yoy,
    q_mode_stats,
    q_rank_correlation,
    q_weighted_quantiles,
)


def _cents(series):
    return (series * 100).round().astype("int64")


def test_spearman_matches_exact(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    o["cents"] = _cents(o["o_totalprice"])
    per = o.groupby("o_custkey").agg(rev=("cents", "sum"), cnt=("cents", "size"))
    by_rev = sorted(per.index, key=lambda k: (-per.loc[k, "rev"], k))
    by_cnt = sorted(per.index, key=lambda k: (-per.loc[k, "cnt"], k))
    r1 = {k: i + 1 for i, k in enumerate(by_rev)}
    r2 = {k: i + 1 for i, k in enumerate(by_cnt)}
    n = len(per)
    sum_d2 = sum((r1[k] - r2[k]) ** 2 for k in per.index)
    rows = q_rank_correlation(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n"], r["sum_d2"]) == (n, sum_d2)
    denom = n * (n * n - 1)
    assert r["rho"] == float(denom - 6 * sum_d2) / float(denom)
    assert -1.0 <= r["rho"] <= 1.0


def test_weighted_quantiles_match_pandas(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    ).to_pandas()
    li["v"] = _cents(li["l_extendedprice"])
    li["w"] = li["l_quantity"].round().astype("int64")
    got = {r["l_returnflag"]: r for r in q_weighted_quantiles(spark, sf_dir).collect()}
    for grp, g in li.groupby("l_returnflag"):
        vw = g.groupby("v")["w"].sum().sort_index()
        total = int(vw.sum())
        cum = vw.cumsum()

        def cut(num, den):
            # smallest v with den*cumw >= num*total
            hits = cum[den * cum >= num * total]
            return int(hits.index[0])

        r = got[grp]
        assert r["total_weight"] == total
        assert r["wq25_cents"] == cut(1, 4)
        assert r["wq50_cents"] == cut(1, 2)
        assert r["wq75_cents"] == cut(3, 4)
        # quartile monotonicity
        assert r["wq25_cents"] <= r["wq50_cents"] <= r["wq75_cents"]


def test_growth_mom_yoy_matches_dict(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    ).to_pandas()
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = _cents(j["o_totalprice"])
    j["ym_idx"] = j["o_orderdate"].map(lambda t: t.year * 12 + t.month)
    rev = {
        (seg, ym): int(g["cents"].sum())
        for (seg, ym), g in j.groupby(["c_mktsegment", "ym_idx"])
    }
    rows = q_growth_mom_yoy(spark, sf_dir).collect()
    assert len(rows) == len(rev)
    for r in rows:
        ym = int(r["ym"])
        idx = (ym // 100) * 12 + ym % 100
        key = (r["c_mktsegment"], idx)
        assert rev[key] == r["rev_cents"]
        prev = rev.get((r["c_mktsegment"], idx - 1))
        yoy = rev.get((r["c_mktsegment"], idx - 12))
        # gap-correctness: missing neighbor month => NULL, never a
        # non-adjacent comparison
        if prev is None:
            assert r["mom_growth"] is None
        else:
            assert r["mom_growth"] == float(rev[key] - prev) / float(prev)
        if yoy is None:
            assert r["yoy_growth"] is None
        else:
            assert r["yoy_growth"] == float(rev[key] - yoy) / float(yoy)


def test_mode_stats_deterministic_tiebreak(spark, sf_dir):
    p = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_type"]
    ).to_pandas()
    rows = {r["p_brand"]: r for r in q_mode_stats(spark, sf_dir).collect()}
    for brand, g in p.groupby("p_brand"):
        counts = g["p_type"].value_counts()
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        r = rows[brand]
        assert (r["mode_type"], r["mode_count"]) == (best[0], int(best[1]))
        assert r["total"] == len(g)
        assert r["n_types"] == counts.size
        assert r["mode_share"] == float(best[1]) / float(len(g))
