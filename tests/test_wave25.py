"""Wave-25 unit/property tests: attribution vs an event-replay,
streak histogram vs a pure-Python islands re-derivation, quintile
transition vs a counting-quantile replay, and full-outer
reconciliation completeness/exclusivity laws."""

import math

import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs25 import (
    q_attribution_last_touch,
    q_decile_transition,
    q_reconcile_daily,
    q_streak_islands,
)

_EPOCH_DAY = lambda t: int(t.value // 10**9) // 86400  # noqa: E731


def test_attribution_matches_replay(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    exp = {}
    last = {}
    for r in ev.itertuples():
        if r.event_type == "purchase":
            touch = last.get(r.user_id, "unattributed")
            cents = round(r.value * 100)
            n, s = exp.get(touch, (0, 0))
            exp[touch] = (n + 1, s + cents)
        if r.event_type in ("view", "click"):
            last[r.user_id] = r.event_type
    got = {
        r["touch_type"]: (r["n_purchases"], r["attributed_cents"])
        for r in q_attribution_last_touch(spark, sf_dir).collect()
    }
    assert got == exp
    # conservation: every purchase is attributed exactly once
    assert sum(n for n, _ in got.values()) == (ev["event_type"] == "purchase").sum()


def test_streaks_match_python_islands(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    ev["day"] = ev["ts"].map(_EPOCH_DAY)
    exp = {}
    users_at = {}
    total_days = 0
    for uid, g in ev.groupby("user_id"):
        days = sorted(set(g["day"]))
        total_days += len(days)
        run = 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                run += 1
            else:
                exp[run] = exp.get(run, 0) + 1
                users_at.setdefault(run, set()).add(uid)
                run = 1
        exp[run] = exp.get(run, 0) + 1
        users_at.setdefault(run, set()).add(uid)
    rows = q_streak_islands(spark, sf_dir).collect()
    got = {r["streak_len"]: r["n_streaks"] for r in rows}
    assert got == exp
    for r in rows:
        assert r["n_users"] == len(users_at[r["streak_len"]])
    # mass conservation: streak lengths sum to distinct (user, day) count
    assert sum(k * v for k, v in got.items()) == total_days


def test_decile_transition_laws(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"],
    ).to_pandas()
    o["day"] = o["o_orderdate"].map(_EPOCH_DAY)
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    mid = (o["day"].min() + o["day"].max()) // 2
    o["half"] = (o["day"] > mid).astype(int) + 1
    halves = {}
    for half, g in o.groupby("half"):
        rev = g.groupby("o_custkey")["cents"].sum()
        vs = sorted(rev.values)
        n = len(vs)
        # counting quantile: smallest value whose cumulative count
        # reaches ceil(i*n/5) == index ceil(i*n/5)-1 in the sorted list
        cuts = [vs[math.ceil(i * n / 5) - 1] for i in (1, 2, 3, 4)]
        halves[half] = {k: 1 + sum(v > c for c in cuts) for k, v in rev.items()}
    both = set(halves[1]) & set(halves[2])
    exp = {}
    for k in both:
        key = (halves[1][k], halves[2][k])
        exp[key] = exp.get(key, 0) + 1
    got = {
        (r["bin_h1"], r["bin_h2"]): r["n_customers"]
        for r in q_decile_transition(spark, sf_dir).collect()
    }
    assert got == exp
    assert sum(got.values()) == len(both)
    assert all(1 <= a <= 5 and 1 <= b <= 5 for a, b in got)


def test_reconcile_daily_complete_and_exclusive(spark, sf_dir):
    o = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderdate"]).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"]).to_pandas()
    od = o["o_orderdate"].map(_EPOCH_DAY).value_counts().to_dict()
    ed = ev["ts"].map(_EPOCH_DAY).value_counts().to_dict()
    rows = q_reconcile_daily(spark, sf_dir).collect()
    assert {r["day"] for r in rows} == set(od) | set(ed)
    for r in rows:
        assert r["n_orders"] == od.get(r["day"], 0)
        assert r["n_events"] == ed.get(r["day"], 0)
        expected_status = (
            "both"
            if r["day"] in od and r["day"] in ed
            else ("orders_only" if r["day"] in od else "events_only")
        )
        assert r["status"] == expected_status
