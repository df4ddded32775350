"""Wave-28 unit/property tests: seasonal-index identities, Pearson vs
NumPy, adoption-curve prefix laws, and a brute-force per-second
concurrency replay for the sweep-line."""

import numpy as np
import pyarrow.parquet as pq

from books2scrape_etl_spark.oracle_shared import SESSION_GAP_S
from books2scrape_etl_spark.query_defs28 import (
    q_adoption_curve,
    q_discount_qty_corr,
    q_max_concurrency,
    q_seasonal_index,
)

_EPOCH_S = lambda t: int(t.value // 10**9)  # noqa: E731


def test_seasonal_index_identities(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    ).to_pandas()
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j["o_totalprice"] * 100).round().astype("int64")
    j["moy"] = j["o_orderdate"].map(lambda t: t.month)
    exp = j.groupby(["c_mktsegment", "moy"])["cents"].sum()
    totals = j.groupby("c_mktsegment")["cents"].sum()
    rows = q_seasonal_index(spark, sf_dir).collect()
    by_seg = {}
    for r in rows:
        assert r["rev_cents"] == int(exp[(r["c_mktsegment"], r["moy"])])
        assert r["seasonal_index"] == float(12 * r["rev_cents"]) / float(
            totals[r["c_mktsegment"]]
        )
        by_seg.setdefault(r["c_mktsegment"], []).append(r["seasonal_index"])
    # indices average to 1 when all 12 months are present
    for seg, idxs in by_seg.items():
        if len(idxs) == 12:
            assert abs(sum(idxs) / 12 - 1.0) < 1e-9


def test_pearson_matches_numpy(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_discount", "l_quantity"],
    ).to_pandas()
    p = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["xb"] = (j["l_discount"] * 100).round().astype("int64")
    j["yb"] = j["l_quantity"].round().astype("int64")
    rows = {r["p_type"]: r for r in q_discount_qty_corr(spark, sf_dir).collect()}
    for ptype, g in j.groupby("p_type"):
        r = rows[ptype]
        n = len(g)
        x, y = g["xb"].values.astype(object), g["yb"].values.astype(object)
        sx, sy = int(sum(x)), int(sum(y))
        sxy = int(sum(a * b for a, b in zip(x, y)))
        sxx, syy = int(sum(a * a for a in x)), int(sum(b * b for b in y))
        assert (r["n"], r["cov_n"]) == (n, n * sxy - sx * sy)
        assert (r["var_x_n"], r["var_y_n"]) == (n * sxx - sx * sx, n * syy - sy * sy)
        if r["var_x_n"] > 0 and r["var_y_n"] > 0:
            np_corr = np.corrcoef(
                g["xb"].values.astype(float), g["yb"].values.astype(float)
            )[0, 1]
            assert abs(r["corr"] - np_corr) < 1e-9
            assert -1.0 <= r["corr"] <= 1.0
        else:
            assert r["corr"] is None


def test_adoption_curve_prefix_laws(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    ev["day"] = ev["ts"].map(lambda t: _EPOCH_S(t) // 86400)
    first = ev.groupby("user_id")["day"].min()
    exp = first.value_counts().sort_index()
    rows = q_adoption_curve(spark, sf_dir).collect()
    assert [r["day"] for r in rows] == list(exp.index)
    cum = 0
    for r, (day, nu) in zip(rows, exp.items()):
        cum += int(nu)
        assert r["new_users"] == nu
        assert r["cum_users"] == cum
    assert rows[-1]["cum_users"] == ev["user_id"].nunique()


def test_max_concurrency_brute_force(spark, sf_dir):
    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    ).to_pandas()
    ev["es"] = ev["ts"].map(_EPOCH_S)
    sessions = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["es", "event_id"])
        start = prev = None
        for es in g["es"].values:
            if prev is None or es - prev > SESSION_GAP_S:
                if start is not None:
                    sessions.append((start, prev))
                start = es
            prev = es
        sessions.append((start, prev))
    # brute force: per occupied day, max concurrency over the day-start
    # instant plus every boundary instant falling inside the day
    points = sorted({s for s, _ in sessions} | {e + 1 for _, e in sessions})
    by_day = {}
    for t in points:
        by_day.setdefault(t // 86400, []).append(t)
    days = {d for s, e in sessions for d in range(s // 86400, e // 86400 + 1)}
    carry = {}
    for s, e in sessions:
        for d in range(s // 86400 + 1, e // 86400 + 1):
            carry[d] = carry.get(d, 0) + 1
    rows = q_max_concurrency(spark, sf_dir).collect()
    # output = every day with >=1 active session (boundary + carry days)
    assert {r["day"] for r in rows} == days
    for r in rows:
        assert r["carry_in"] == carry.get(r["day"], 0)
        cands = [r["day"] * 86400] + by_day.get(r["day"], [])
        expected = max(
            sum(1 for s, e in sessions if s <= t <= e) for t in cands
        )
        assert r["max_concurrent"] == expected


def test_max_concurrency_day_boundary_rules(spark, tmp_path):
    """Two sweep-line day-boundary edge cases (the oracle applies the
    same rules, so the DuckDB differential cannot pin them — only a
    synthetic replay can): (1) a day fully inside a midnight-spanning
    session appears as a carry-only row; (2) a session ending at a
    day's last second must not push a stray -1 into the next day's
    sweep."""
    import os

    from pyspark.sql import functions as F

    from books2scrape_etl_spark.queries import QUERIES

    D = 20_000  # arbitrary epoch day

    def at(day, h, m=0, s=0):
        return day * 86400 + h * 3600 + m * 60 + s

    es_list = [
        # user 1: one session day D 23:00 -> day D+2 01:00 (every gap
        # < 6 h) — covers all of day D+1 with no boundary inside it
        (1, at(D, 23)),
        (1, at(D + 1, 4)),
        (1, at(D + 1, 9)),
        (1, at(D + 1, 14)),
        (1, at(D + 1, 19)),
        (1, at(D + 2, 0, 30)),
        (1, at(D + 2, 1)),
        # user 2: session ending exactly at day D+3's last second
        (2, at(D + 3, 20)),
        (2, at(D + 3, 23, 59, 59)),
        # user 3: session inside day D+4
        (3, at(D + 4, 1)),
        (3, at(D + 4, 2)),
    ]
    rows = [(i, uid, es) for i, (uid, es) in enumerate(es_list)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, es long")
    df.select(
        "event_id", "user_id", F.timestamp_seconds("es").alias("ts")
    ).write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = {
        r["day"]: (r["carry_in"], r["max_concurrent"])
        for r in QUERIES["max_concurrency"](spark, str(tmp_path)).collect()
    }
    assert got == {
        D: (0, 1),
        D + 1: (1, 1),  # carry-only day — dropped before the fix
        D + 2: (1, 1),
        D + 3: (0, 1),
        D + 4: (0, 1),  # deflated to 0 before the fix (stray -1 at 00:00:00)
    }
