"""Wave-19 unit/property tests: funnel order-sensitivity vs a pandas
event-replay, cohort-retention laws (month-0 is 1.0, sizes partition
the customer base), profile_table vs pandas column stats, and
edit_distance_pairs vs a pure-Python Wagner-Fischer re-derivation."""

import pandas as pd
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs19 import (
    _ED_BLOCK,
    _ED_MAX,
    _ED_PREFIX,
    _PROFILE_COLS,
    q_cohort_retention,
    q_edit_distance_pairs,
    q_funnel_conversion,
    q_profile_table,
)


def _events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_funnel_matches_event_replay(spark, sf_dir):
    ev = _events(sf_dir).sort_values(["user_id", "ts", "event_id"])
    u1 = u2 = u3 = 0
    for _, g in ev.groupby("user_id"):
        seen_view = seen_qc = False
        r1 = r2 = r3 = False
        for t in g["event_type"]:
            # evaluate the current event against STRICTLY-earlier state
            is_qc = t == "click" and seen_view
            r1 = r1 or t == "view"
            r2 = r2 or is_qc
            r3 = r3 or (t == "purchase" and seen_qc)
            # then fold the current event into the "before" state
            seen_view = seen_view or t == "view"
            seen_qc = seen_qc or is_qc
        u1 += r1
        u2 += r2
        u3 += r3
    got = {r["stage"]: r for r in q_funnel_conversion(spark, sf_dir).collect()}
    assert got[1]["users"] == u1
    assert got[2]["users"] == u2
    assert got[3]["users"] == u3
    assert got[1]["step"] == "view"
    if u1:
        assert got[2]["conversion"] == u2 / u1
        assert got[3]["conversion"] == u3 / u1


def test_funnel_is_monotone_and_order_sensitive(spark, sf_dir):
    rows = q_funnel_conversion(spark, sf_dir).collect()
    users = [r["users"] for r in sorted(rows, key=lambda r: r["stage"])]
    assert users[0] >= users[1] >= users[2] >= 0
    # order sensitivity: stage-2 must be strictly below the unordered
    # "has view AND has click" count (some clicks precede every view)
    ev = _events(sf_dir)
    by_user = ev.groupby("user_id")["event_type"].agg(set)
    unordered = sum(1 for s in by_user if "view" in s and "click" in s)
    assert users[1] <= unordered


def test_cohort_retention_laws(spark, sf_dir):
    pdf = q_cohort_retention(spark, sf_dir).toPandas()
    m0 = pdf[pdf["months_since"] == 0]
    # every cohort appears at month 0 and is fully active there
    assert set(m0["cohort_ym"]) == set(pdf["cohort_ym"])
    assert (m0["active"] == m0["cohort_size"]).all()
    assert (m0["retention"] == 1.0).all()
    assert (pdf["months_since"] >= 0).all()
    # cohort sizes partition the customer base
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    sizes = m0.drop_duplicates("cohort_ym")["cohort_size"].sum()
    assert sizes == orders["o_custkey"].nunique()


def test_cohort_active_matches_pandas(spark, sf_dir):
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    first = orders.groupby("o_custkey")["o_orderdate"].min()
    cidx = first.dt.year * 12 + first.dt.month
    cym = first.dt.year * 100 + first.dt.month
    df = orders.assign(
        cohort_ym=orders["o_custkey"].map(cym),
        months_since=orders["o_orderdate"].dt.year * 12
        + orders["o_orderdate"].dt.month
        - orders["o_custkey"].map(cidx),
    )
    exp = (
        df.groupby(["cohort_ym", "months_since"])["o_custkey"]
        .nunique()
        .reset_index(name="active")
    )
    got = q_cohort_retention(spark, sf_dir).toPandas()[
        ["cohort_ym", "months_since", "active"]
    ]
    merged = exp.merge(got, on=["cohort_ym", "months_since"], how="outer")
    assert len(merged) == len(exp) == len(got)
    assert (merged["active_x"] == merged["active_y"]).all()


def test_profile_matches_pandas(spark, sf_dir):
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    got = {r["column_name"]: r for r in q_profile_table(spark, sf_dir).collect()}
    assert set(got) == {name for name, _, _ in _PROFILE_COLS}
    for name, _, _ in _PROFILE_COLS:
        if name == "l_shipdate":
            s = li[name].map(lambda d: str(int(d.timestamp())))
        else:
            s = li[name].astype(str)
        r = got[name]
        assert r["n_rows"] == len(li)
        assert r["n_null"] == li[name].isna().sum()
        assert r["n_distinct"] == s.nunique()
        assert r["min_s"] == s.min()
        assert r["max_s"] == s.max()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_distance_matches_python(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    pfx = docs.assign(
        blk=docs["text"].str[:_ED_BLOCK], pfx=docs["text"].str[:_ED_PREFIX]
    )[["doc_id", "blk", "pfx"]]
    exp = {}
    for _, g in pfx.groupby("blk"):
        recs = list(g.itertuples(index=False))
        for i in range(len(recs)):
            for j in range(len(recs)):
                a, b = recs[i], recs[j]
                if a.doc_id < b.doc_id:
                    d = _lev(a.pfx, b.pfx)
                    if d <= _ED_MAX:
                        exp[(a.doc_id, b.doc_id)] = d
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["dist"]
        for r in q_edit_distance_pairs(spark, sf_dir).collect()
    }
    assert got == exp


def test_edit_distance_pairs_are_canonical(spark, sf_dir):
    pdf = q_edit_distance_pairs(spark, sf_dir).toPandas()
    assert (pdf["doc_id_a"] < pdf["doc_id_b"]).all()
    assert (pdf["dist"] >= 0).all() and (pdf["dist"] <= _ED_MAX).all()
    assert not pdf.duplicated(["doc_id_a", "doc_id_b"]).any()
