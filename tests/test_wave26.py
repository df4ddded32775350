"""Wave-26 unit/property tests: TWAP vs a pandas gap replay, hazard
at-risk/active laws vs exact re-derivation, checksum order-invariance
+ hashlib parity, and WITH-TIES rank semantics vs a Counter replay."""

import hashlib

import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs26 import (
    q_hazard_curve,
    q_table_checksum,
    q_topk_with_ties,
    q_twap_value,
)

_EPOCH_S = lambda t: int(t.value // 10**9)  # noqa: E731


def test_twap_matches_replay(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["es"] = ev["ts"].map(_EPOCH_S)
    ev["day"] = ev["es"] // 86400
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    exp = {}
    for (etype, _), g in ev.groupby(["event_type", "day"]):
        g = g.sort_values(["es", "event_id"])
        es = g["es"].tolist()
        cents = g["cents"].tolist()
        for i in range(len(es) - 1):
            gap = es[i + 1] - es[i]
            n, ws, vs = exp.get(etype, (0, 0, 0))
            exp[etype] = (n + 1, ws + gap, vs + cents[i] * gap)
    rows = {r["event_type"]: r for r in q_twap_value(spark, sf_dir).collect()}
    assert set(rows) == set(exp)
    for etype, (n, ws, vs) in exp.items():
        r = rows[etype]
        assert (r["n_weighted"], r["total_seconds"]) == (n, ws)
        assert r["twap_cents"] == float(vs) / float(ws)


def test_hazard_curve_laws(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).to_pandas()
    o["idx"] = o["o_orderdate"].map(lambda t: t.year * 12 + t.month)
    first = o.groupby("o_custkey")["idx"].min()
    horizon = int(o["idx"].max())
    ev = {
        (r.o_custkey, r.idx - first[r.o_custkey])
        for r in o.itertuples()
        if r.idx > first[r.o_custkey]
    }
    rows = q_hazard_curve(spark, sf_dir).collect()
    active = {}
    for cust, m in ev:
        active[m] = active.get(m, 0) + 1
    assert {r["month_offset"]: r["active"] for r in rows} == active
    prev_at_risk = None
    for r in sorted(rows, key=lambda r: r["month_offset"]):
        at_risk = int((horizon - first >= r["month_offset"]).sum())
        assert r["at_risk"] == at_risk
        assert r["hazard"] == float(r["active"]) / float(at_risk)
        assert r["active"] <= at_risk
        # at_risk is non-increasing in the offset
        if prev_at_risk is not None:
            assert at_risk <= prev_at_risk
        prev_at_risk = at_risk


def test_checksum_order_invariant_and_matches_hashlib(spark, sf_dir):
    o = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    acc, n = 0, 0
    for r in o.itertuples():
        day = _EPOCH_S(r.o_orderdate) // 86400
        cents = round(r.o_totalprice * 100)
        s = f"{r.o_orderkey}|{r.o_custkey}|{r.o_orderstatus}|{cents}|{day}|{r.o_orderpriority}"
        acc ^= int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        n += 1
    rows = {r["tbl"]: r for r in q_table_checksum(spark, sf_dir).collect()}
    assert rows["orders"]["n_rows"] == n
    # python iterates in file order; Spark aggregates across shuffled
    # partitions — equality IS the order-invariance check
    assert rows["orders"]["xor_fp"] == acc
    li_n = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    assert rows["lineitem"]["n_rows"] == li_n


def test_topk_with_ties_semantics(spark, sf_dir):
    p = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_brand", "p_type", "p_retailprice"]
    ).to_pandas()
    p["cents"] = (p["p_retailprice"] * 100).round().astype("int64")
    rows = q_topk_with_ties(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r["p_brand"], []).append(r)
    for brand, g in p.groupby("p_brand"):
        rev = g.groupby("p_type")["cents"].sum().sort_values(ascending=False)
        vals = sorted(set(rev.values), reverse=True)
        keep_revs = set(vals[:2])
        expected = {(t, int(v)) for t, v in rev.items() if v in keep_revs}
        assert {(r["p_type"], r["rev_cents"]) for r in got[brand]} == expected
        # rank law: rank = 1 + number of strictly-greater revenues
        for r in got[brand]:
            assert r["rk"] == 1 + sum(1 for v in rev.values if v > r["rev_cents"])
        # WITH TIES can exceed 2, never undershoot (when >=2 types)
        assert len(got[brand]) >= min(2, rev.size)
