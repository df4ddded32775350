"""Wave-23 unit/property tests: calendar fields vs Python's datetime,
largest-remainder apportionment laws vs an exact-int re-derivation,
winsorized means vs a pandas counting-quantile twin, and zone-map
soundness (no matching row ever lives in a skippable zone)."""

import datetime as dt
import math

import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs23 import (
    _APPORTION_N,
    _ZONE_BUCKET,
    _ZONE_PRED_DAY,
    q_apportion_budget,
    q_calendar_dim,
    q_winsorize,
    q_zone_maps,
)

_EPOCH = dt.date(1970, 1, 1)


def test_calendar_dim_matches_datetime(spark, sf_dir):
    o = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderdate"]).to_pandas()
    days = o["o_orderdate"].map(lambda t: (t.date() - _EPOCH).days)
    mn, mx = int(days.min()), int(days.max())
    rows = q_calendar_dim(spark, sf_dir).collect()
    # dense, contiguous, exactly-once
    assert [r["d_day"] for r in rows] == list(range(mn, mx + 1))
    for r in rows:
        d = _EPOCH + dt.timedelta(days=r["d_day"])
        assert r["d_date"] == d.isoformat()
        assert r["d_year"] == d.year
        assert r["d_quarter"] == (d.month - 1) // 3 + 1
        assert r["d_month"] == d.month
        assert r["d_dom"] == d.day
        assert r["dow_iso"] == d.isoweekday()
        assert r["is_weekend"] == (1 if d.isoweekday() >= 6 else 0)
        nxt = d + dt.timedelta(days=1)
        assert r["is_month_end"] == (1 if nxt.month != d.month else 0)


def test_apportionment_laws(spark, sf_dir):
    rows = q_apportion_budget(spark, sf_dir).collect()
    total = sum(r["cnt"] for r in rows)
    # exact-sum law: seats hand out the whole budget, nothing more
    assert sum(r["seats"] for r in rows) == _APPORTION_N
    bonus = []
    for r in rows:
        assert r["seat0"] == (_APPORTION_N * r["cnt"]) // total
        assert r["remainder"] == (_APPORTION_N * r["cnt"]) % total
        # quota rule: floor or floor+1, never anything else
        assert r["seats"] in (r["seat0"], r["seat0"] + 1)
        bonus.append((r["remainder"], r["seats"] - r["seat0"]))
    # largest-remainder rule: every +1 cell has remainder >= every +0 cell
    plus = [rem for rem, b in bonus if b == 1]
    zero = [rem for rem, b in bonus if b == 0]
    if plus and zero:
        assert min(plus) >= max(zero)


def test_winsorize_matches_pandas(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    ).to_pandas()
    li["v"] = (li["l_extendedprice"] * 100).round().astype("int64")
    got = {r["l_returnflag"]: r for r in q_winsorize(spark, sf_dir).collect()}
    assert set(got) == set(li["l_returnflag"].unique())
    for grp, g in li.groupby("l_returnflag"):
        vs = sorted(int(x) for x in g["v"].values)
        n = len(vs)
        # counting quantile: smallest value whose cumulative count
        # reaches ceil(p*n) == index ceil(p*n)-1 in the sorted list
        lo = vs[math.ceil(n / 20) - 1]
        hi = vs[math.ceil(19 * n / 20) - 1]
        r = got[grp]
        assert (r["n"], r["cut_lo_cents"], r["cut_hi_cents"]) == (n, lo, hi)
        assert r["n_clamped_lo"] == sum(1 for v in vs if v < lo)
        assert r["n_clamped_hi"] == sum(1 for v in vs if v > hi)
        # clamp-rate law from the strict inequalities: <5% on each side
        assert 20 * r["n_clamped_lo"] < n
        assert 20 * r["n_clamped_hi"] <= n
        w = [min(max(v, lo), hi) for v in vs]
        assert r["mean_cents"] == float(sum(vs)) / n
        assert r["mean_winsor_cents"] == float(sum(w)) / n
        assert lo <= r["mean_winsor_cents"] <= hi


def test_zone_maps_sound_and_complete(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    li["day"] = li["l_shipdate"].map(lambda t: (t.date() - _EPOCH).days)
    li["zone"] = li["l_orderkey"] // _ZONE_BUCKET
    rows = q_zone_maps(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in rows) == len(li)
    stats = li.groupby("zone")["day"].agg(["min", "max", "count"])
    assert len(rows) == len(stats)
    skippable = set()
    for r in rows:
        s = stats.loc[r["zone_id"]]
        assert (r["min_day"], r["max_day"], r["n_rows"]) == (
            s["min"],
            s["max"],
            s["count"],
        )
        assert r["skippable"] == (1 if r["max_day"] < _ZONE_PRED_DAY else 0)
        if r["skippable"]:
            skippable.add(r["zone_id"])
    # soundness: no row matching day >= pred lives in a skippable zone
    hits = li[li["day"] >= _ZONE_PRED_DAY]
    assert not set(hits["zone"]).intersection(skippable)
