"""Wave-14 unit/property tests: association rules vs itertools brute
force, incremental-MV merge == full recompute (plus empty-delta
idempotence), chi-square marginal laws, autocorrelation vs a NumPy
Pearson oracle, A/B z-test sign/total laws, session paths vs a pure-
Python sessionizer, and inverted-index postings laws."""

import math
from collections import Counter, defaultdict
from itertools import permutations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from books2scrape_etl_spark.oracle_shared import SESSION_GAP_S as _SESSION_GAP_S
from books2scrape_etl_spark.query_defs14 import (
    _AB_CONV_MIN,
    _MV_CUT_ES,
    q_ab_lift,
    q_acf_lags,
    q_assoc_rules,
    q_chi_square,
    q_inverted_index,
    q_mv_incremental,
    q_session_paths,
)


def _events_pdf(sf_dir):
    pdf = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    # parquet ts is datetime64[us] — floor-divide by 1e6, not 1e9
    assert pdf["ts"].dtype == "datetime64[us]"
    pdf["es"] = pdf["ts"].astype("int64") // 10**6
    return pdf


# ------------------------------------------------------------- assoc_rules


def test_assoc_rules_match_itertools_brute_force(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    baskets = defaultdict(set)
    for r in pdf.itertuples():
        baskets[(r.user_id, r.es // 86400)].add(r.event_type)
    n_baskets = len(baskets)
    item = Counter()
    pair = Counter()
    for items in baskets.values():
        for t in items:
            item[t] += 1
        for a, c in permutations(sorted(items), 2):
            pair[(a, c)] += 1

    rows = q_assoc_rules(spark, sf_dir).collect()
    assert len(rows) == len(pair)
    for r in rows:
        assert r.n_ab == pair[(r.ante, r.cons)]
        assert r.n_ante == item[r.ante] and r.n_cons == item[r.cons]
        assert r.n_baskets == n_baskets
        assert r.confidence == r.n_ab / r.n_ante
        assert 0.0 < r.confidence <= 1.0
        assert r.lift == (r.n_ab * n_baskets) / (r.n_ante * r.n_cons)


def test_assoc_rules_support_is_symmetric(spark, sf_dir):
    rows = q_assoc_rules(spark, sf_dir).collect()
    n_ab = {(r.ante, r.cons): r.n_ab for r in rows}
    for (a, c), n in n_ab.items():
        assert n_ab[(c, a)] == n  # co-occurrence counts are symmetric


# --------------------------------------------------------- mv_incremental


def test_mv_merge_equals_full_recompute(spark, sf_dir):
    merged = {
        (r.event_type, r.day): (r.n_events, r.sum_cents)
        for r in q_mv_incremental(spark, sf_dir).collect()
    }
    pdf = _events_pdf(sf_dir)
    pdf["day"] = pdf["es"] // 86400
    pdf["cents"] = np.floor(pdf["value"].to_numpy() * 100).astype("int64")
    full = pdf.groupby(["event_type", "day"]).agg(
        n_events=("event_id", "size"), sum_cents=("cents", "sum")
    )
    assert len(merged) == len(full)
    for (et, day), row in full.iterrows():
        assert merged[(et, day)] == (row.n_events, row.sum_cents)
    # the cut actually splits the span — both sides contribute
    assert (pdf["es"] < _MV_CUT_ES).any() and (pdf["es"] >= _MV_CUT_ES).any()


def test_mv_merge_empty_delta_is_identity(spark):
    # partials with an empty delta merge to exactly the base
    base = spark.createDataFrame(
        [("a", 1, 3, 100), ("b", 1, 2, 50)],
        "event_type string, day long, n_events long, sum_cents long",
    )
    delta = base.where(F.lit(False))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_cents").alias("sum_cents"))
    )
    assert {tuple(r) for r in merged.collect()} == {("a", 1, 3, 100), ("b", 1, 2, 50)}


# ------------------------------------------------------------- chi_square


def test_chi_square_marginal_laws(spark, sf_dir):
    rows = q_chi_square(spark, sf_dir).collect()
    n_total = rows[0].n_total
    assert sum(r.observed for r in rows) == n_total
    by_lang = defaultdict(int)
    by_source = defaultdict(int)
    for r in rows:
        by_lang[r.lang] += r.observed
        by_source[r.source] += r.observed
        assert r.row_total == by_lang[r.lang] or True  # accumulate first
        assert r.expected > 0 and r.contrib >= 0.0
        e = (r.row_total * r.col_total) / n_total
        assert r.expected == e
        assert math.isclose(r.contrib, (r.observed - e) ** 2 / e, rel_tol=1e-12)
    for r in rows:
        assert r.row_total == by_lang[r.lang]
        assert r.col_total == by_source[r.source]
    # exact cell counts vs pandas (zero cells are absent, so the
    # "expected sums to N" law need not hold — check cells instead)
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    counts = docs.groupby(["lang", "source"]).size()
    assert len(rows) == len(counts)
    for r in rows:
        assert r.observed == counts[(r.lang, r.source)]


# --------------------------------------------------------------- acf_lags


def test_acf_matches_numpy_pearson(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pdf["day"] = pdf["es"] // 86400
    counts = pdf.groupby(["event_type", "day"]).size()
    rows = q_acf_lags(spark, sf_dir).collect()
    assert rows, "expected at least one (type, lag) group"
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        s = counts[r.event_type].sort_index()
        days = s.index.to_numpy()
        x, y = [], []
        for d, c in s.items():
            if d + r.lag in s.index:
                x.append(c)
                y.append(s[d + r.lag])
        assert r.n == len(x)
        expect = np.corrcoef(np.array(x, dtype=float), np.array(y, dtype=float))[0, 1]
        assert math.isclose(r.acf, expect, rel_tol=1e-9), (r.event_type, r.lag)


def test_acf_perfect_linear_series_is_one(spark):
    # a strictly increasing integer series autocorrelates to exactly 1
    # under the same sufficient-statistic formula at every lag
    h = spark.createDataFrame(
        [("t", d, d + 7) for d in range(10)], "event_type string, day long, c long"
    )
    a = h.withColumn("lag", F.explode(F.array(F.lit(1), F.lit(2))))
    b = h.select("event_type", F.col("day").alias("bday"), F.col("c").alias("y"))
    p = a.join(
        b, (a["event_type"] == b["event_type"]) & (b["bday"] == a["day"] + a["lag"])
    ).select(F.col("lag"), a["c"].alias("x"), "y")
    s = p.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    out = s.select(
        "lag",
        (
            cov.cast("double") / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double")))
        ).alias("acf"),
    ).collect()
    assert {r.lag for r in out} == {1, 2}
    for r in out:
        assert math.isclose(r.acf, 1.0, rel_tol=1e-12)


# ---------------------------------------------------------------- ab_lift


def test_ab_lift_totals_and_sign(spark, sf_dir):
    row = q_ab_lift(spark, sf_dir).collect()[0]
    pdf = _events_pdf(sf_dir)
    n_users = pdf["user_id"].nunique()
    assert row.n0 + row.n1 == n_users
    assert row.n0 > 0 and row.n1 > 0
    # conversion definition: >= _AB_CONV_MIN purchases
    purchases = (
        pdf[pdf["event_type"] == "purchase"].groupby("user_id").size()
    )
    conv_users = int((purchases >= _AB_CONV_MIN).sum())
    assert row.c0 + row.c1 == conv_users
    assert 0 < conv_users < n_users, "conversion must have variance"
    assert row.rate0 == row.c0 / row.n0 and row.rate1 == row.c1 / row.n1
    assert row.lift == row.rate1 - row.rate0
    assert (row.z > 0) == (row.lift > 0) or row.lift == 0.0
    pooled = (row.c0 + row.c1) / (row.n0 + row.n1)
    se = math.sqrt(pooled * (1 - pooled) * (1 / row.n0 + 1 / row.n1))
    assert math.isclose(row.z, row.lift / se, rel_tol=1e-12)


# ------------------------------------------------------------ session_paths


def test_session_paths_match_python_sessionizer(spark, sf_dir):
    pdf = _events_pdf(sf_dir).sort_values(["user_id", "es", "event_id"])
    paths = Counter()
    path_users = defaultdict(set)
    for uid, g in pdf.groupby("user_id"):
        prev = None
        cur = []
        sessions = []
        for r in g.itertuples():
            if prev is not None and r.es - prev > _SESSION_GAP_S:
                sessions.append(cur)
                cur = []
            cur.append(r.event_type)
            prev = r.es
        sessions.append(cur)
        for s in sessions:
            p = ">".join(s[:8])
            paths[p] += 1
            path_users[p].add(uid)
    expect = sorted(
        ((n, p) for p, n in paths.items()), key=lambda t: (-t[0], t[1])
    )[:20]
    rows = q_session_paths(spark, sf_dir).collect()
    assert [(r.n_sessions, r.path) for r in rows] == expect
    for r in rows:
        assert r.n_users == len(path_users[r.path])
        assert len(r.path.split(">")) <= 8


# ----------------------------------------------------------- inverted_index


def test_inverted_index_postings_laws(spark, sf_dir):
    rows = q_inverted_index(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.df >= 5
        assert r.tf >= r.df  # total occurrences >= documents containing
        head = r.postings_head.split(",")
        assert len(head) == min(r.df, 20)
        ids = [int(x) for x in head]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)


def test_inverted_index_spot_token_vs_pandas(spark, sf_dir):
    import re

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    rows = q_inverted_index(spark, sf_dir).collect()
    # spot-check the highest-df token end to end
    top = max(rows, key=lambda r: (r.df, r.token))
    tf = 0
    doc_ids = set()
    for r in docs.itertuples():
        toks = re.sub(r"[^a-z0-9]+", " ", str(r.text).lower()).split()
        c = toks.count(top.token)
        if c:
            tf += c
            doc_ids.add(r.doc_id)
    assert top.df == len(doc_ids)
    assert top.tf == tf
    assert [int(x) for x in top.postings_head.split(",")] == sorted(doc_ids)[:20]
