"""Property tests for the wave-12 operators: rolling-window set law,
gap-fill/LOCF laws, PMI against a direct python reference, and k-means
against a NumPy Lloyd's reference."""

import datetime as dt
import math
import random
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from books2scrape_etl_spark import query_defs12 as q12


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


@settings(max_examples=12, deadline=None)
@given(st.data())
def test_rolling_active_equals_bruteforce_union(data):
    """wau(day) = |union of active-user sets over days day-6..day| for
    random activity patterns — checked against a direct python set
    union (pure-python replay of the expansion; the Spark form is
    pinned by the unit test + oracle sim on the same derivation)."""
    n_users = data.draw(st.integers(1, 6))
    pattern = data.draw(
        st.lists(
            st.tuples(st.integers(0, n_users - 1), st.integers(0, 20)),
            min_size=1,
            max_size=40,
        )
    )
    active = {}
    for u, d in pattern:
        active.setdefault(d, set()).add(u)
    # replay the aligned expansion: user active on d serves windows d..d+6
    served = {}
    for d, users in active.items():
        for k in range(7):
            served.setdefault(d + k, set()).update(users)
    # the law: expansion result == brute-force trailing union
    for day, users in served.items():
        brute = set()
        for back in range(7):
            brute |= active.get(day - back, set())
        assert users == brute


def test_rolling_active_spark_matches_python(spark, monkeypatch):
    """End-to-end Spark result equals the python set-union reference on
    a random (seeded) activity pattern."""
    rng = random.Random(11)
    day0 = dt.datetime(2024, 1, 1)
    rows = []
    active = {}
    for i in range(120):
        u, d = rng.randrange(8), rng.randrange(15)
        rows.append((i, day0 + dt.timedelta(days=d, minutes=i), u, "a", 0.0))
        active.setdefault(d, set()).add(u)
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: _events_df(spark, rows))
    got = {r.day: (r.dau, r.wau) for r in q12.q_rolling_active(spark, "unused").collect()}
    base = int(day0.timestamp()) // 86400
    for day, (dau, wau) in got.items():
        d = day - base
        assert dau == len(active.get(d, set()))
        brute = set()
        for back in range(7):
            brute |= active.get(d - back, set())
        assert wau == len(brute), (d, wau, brute)


def test_gapfill_laws(spark, monkeypatch):
    """Grid is contiguous per user; n_events over the grid sums to the
    input count; locf_value is non-null from the first observed hour
    on and equals the most recent hourly sum."""
    rng = random.Random(23)
    day0 = dt.datetime(2024, 2, 1)
    rows = []
    for i in range(200):
        u = rng.choice([0, 29]) * 1  # users passing the % 29 filter
        rows.append(
            (i, day0 + dt.timedelta(hours=rng.randrange(48), seconds=rng.randrange(3600)), u, "a", float(rng.randrange(100)) / 4)
        )
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: _events_df(spark, rows))
    out = q12.q_ts_gapfill(spark, "unused").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert set(per_user) == {0, 29}
    n_by_user = Counter(u for (_, _, u, _, _) in rows)
    for u, rs in per_user.items():
        rs.sort(key=lambda r: r.hour_es)
        hours = [r.hour_es for r in rs]
        assert hours == list(range(hours[0], hours[-1] + 1, 3600))  # contiguous
        assert sum(r.n_events for r in rs) == n_by_user[u]  # nothing lost
        last = None
        for r in rs:
            assert (r.is_gap == 1) == (r.n_events == 0)
            if r.n_events > 0:
                assert r.locf_value is not None
                last = r.locf_value
            else:
                assert r.locf_value == last  # carried forward unchanged


def test_pmi_matches_python_reference(spark, monkeypatch):
    """Spark top-k PMI == a direct python Counter computation (same
    ratio formula, same tie-break) on a seeded random corpus."""
    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    docs = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randrange(2, 12))]
        docs.append((i, " ".join(words), "en", "t", 1))
    monkeypatch.setattr(
        q12,
        "read_table",
        lambda s, n, d: spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ),
    )
    uni, bi = Counter(), Counter()
    for _, text, *_ in docs:
        toks = text.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    nu, nb = sum(uni.values()), sum(bi.values())
    scored = [
        (((cxy * float(nu)) * nu) / ((uni[w1] * float(uni[w2])) * nb), w1, w2, cxy)
        for (w1, w2), cxy in bi.items()
        if cxy >= q12._PMI_MIN_CNT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = scored[: q12._PMI_TOPK]
    got = q12.q_pmi_collocations(spark, "unused").collect()
    assert len(got) == len(expect)
    for r, (ratio, w1, w2, cxy) in zip(sorted(got, key=lambda r: r.rnk), expect):
        assert (r.w1, r.w2, r.cxy) == (w1, w2, cxy)
        assert math.isclose(r.ratio, ratio, rel_tol=1e-12)


def test_kmeans_matches_numpy_lloyd(spark):
    """Pure-DataFrame Lloyd's tracks a NumPy reference (same init, same
    round count) to float tolerance: same per-round inertia and the
    same final assignment on well-conditioned data."""
    import numpy as np

    rng = np.random.RandomState(3)
    centers = np.array([[0.0, 0.0], [20.0, 0.0], [0.0, 20.0]])
    pts = np.concatenate([c + rng.randn(15, 2) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    from books2scrape_etl_spark.operators.cluster import lloyd_kmeans

    assigned, history, final = lloyd_kmeans(df, k=3, iterations=4)

    cent = pts[:3].copy()  # deterministic first-k init, same as the operator
    ref_hist = []
    for _ in range(4):
        d2 = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        ref_hist.append(d2.min(axis=1).sum())
        for c in range(3):
            if (lab == c).any():
                cent[c] = pts[lab == c].mean(axis=0)
    d2 = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    ref_lab = d2.argmin(axis=1)

    for h, rh in zip(history, ref_hist):
        assert math.isclose(h, rh, rel_tol=1e-9), (history, ref_hist)
    got = {r.vec_id: r.cluster - 1 for r in assigned.collect()}
    assert all(got[i] == ref_lab[i] for i in range(len(pts)))


def test_wave12_results_partitioning_invariant(spark, sf_dir):
    """Re-partitioning the input must not change any wave-12 result —
    the distributed-correctness law the oracle compare can't see
    (it always reads the same layout). Exercised by monkeypatching the
    reader to shuffle the input into a different partitioning."""
    import books2scrape_etl_spark.query_defs12 as q12
    from books2scrape_etl_spark.io import read_table

    def canon(df):
        rows = [tuple(r) for r in df.collect()]
        return sorted(rows, key=repr)

    from books2scrape_etl_spark.queries import QUERIES

    for qname in ["ohlc_bars", "rolling_active", "gini_diversity",
                  "grouped_regression", "feature_hashing", "robust_outliers"]:
        base = canon(QUERIES[qname](spark, sf_dir))
        orig = q12.read_table
        try:
            q12.read_table = lambda s, n, d: read_table(s, n, d).repartition(13)
            repart = canon(QUERIES[qname](spark, sf_dir))
        finally:
            q12.read_table = orig
        assert repart == base, qname


def test_grouped_regression_matches_numpy_polyfit(spark, monkeypatch):
    """Sufficient-statistics OLS equals numpy.polyfit (direct lstsq) on
    seeded random data, to float tolerance."""
    import datetime as dt

    import numpy as np

    rng = random.Random(5)
    epoch0 = dt.datetime(2024, 1, 1)
    rows, xs, ys = [], [], []
    for i in range(200):
        x = rng.randrange(0, 100000)
        y = 0.25 * x + 40.0 + rng.uniform(-5, 5)
        rows.append((i, epoch0 + dt.timedelta(seconds=x), 0, "g", y))
        xs.append(x)
        ys.append(y)
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: _events_df(spark, rows))
    r = q12.q_grouped_regression(spark, "unused").collect()[0]
    slope, intercept = np.polyfit(np.array(xs, dtype=float), np.array(ys, dtype=float), 1)
    assert math.isclose(r.slope, slope, rel_tol=1e-9)
    assert math.isclose(r.intercept, intercept, rel_tol=1e-6)


def test_feature_hashing_conserves_token_mass(spark, monkeypatch):
    """Per doc, the hashed TF vector sums to the doc's token count —
    the hashing trick redistributes mass, never drops or invents it."""
    rng = random.Random(9)
    docs = []
    for i in range(0, 170, 17):  # doc ids passing the % 17 filter
        words = " ".join(f"w{rng.randrange(500)}" for _ in range(rng.randrange(1, 60)))
        docs.append((i, words, "en", "t", 1))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    out = q12.q_feature_hashing(spark, "unused").collect()
    mass = Counter()
    for r in out:
        mass[r.doc_id] += r.tf
    expect = {i: len(t.split()) for (i, t, *_) in docs}
    assert dict(mass) == expect


def test_percent_rank_scale_random_shapes(spark):
    """percent_rank_scale equals the exact window form on random data
    across random partition counts (hypothesis-style seeded sweep)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from books2scrape_etl_spark.operators.scale import percent_rank_scale

    rng = random.Random(31)
    for trial in range(3):
        n = rng.randrange(5, 80)
        rows = [
            (i, rng.choice(["a", "b", "c"]), float(rng.randrange(20)))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        exact = {
            r.event_id: r.q
            for r in df.select("event_id", F.percent_rank().over(w).alias("q")).collect()
        }
        got = {
            r.event_id: r.q
            for r in percent_rank_scale(
                df, "event_type", ["value", "event_id"],
                num_partitions=rng.randrange(1, 9),
            ).collect()
        }
        assert got == exact, trial
