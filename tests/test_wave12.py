"""Wave-12 unit tests: k-means ground truth, OHLC first/last picks,
gap-fill/LOCF laws, rolling distinct-user windows, PMI ordering."""

import math

import pytest
from pyspark.sql import functions as F

from books2scrape_etl_spark.operators.cluster import assign_clusters, lloyd_kmeans


def _blob(center, n, spread, start_id):
    # deterministic "noise": small rational offsets, far below blob
    # separation, so nearest-centroid recovery is exact
    rows = []
    for i in range(n):
        vec = [c + ((i * 7 + j * 3) % 5 - 2) * spread for j, c in enumerate(center)]
        rows.append((start_id + i, [float(v) for v in vec]))
    return rows


def test_kmeans_recovers_planted_blobs(spark):
    centers = [[0.0, 0.0, 0.0, 0.0], [100.0, 0.0, 50.0, 0.0], [0.0, 200.0, 0.0, -100.0]]
    rows = []
    for b, c in enumerate(centers):
        rows += _blob(c, 20, 0.01, b * 20)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, history, final = lloyd_kmeans(df, k=3, iterations=4)
    got = assigned.select("vec_id", "cluster").collect()
    # every blob maps to exactly one cluster, and the three differ
    by_blob = {}
    for r in got:
        by_blob.setdefault(r.vec_id // 20, set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_blob.values()), by_blob
    assert len({next(iter(s)) for s in by_blob.values()}) == 3
    # Lloyd's descent property
    for a, b in zip(history, history[1:]):
        assert b <= a * (1 + 1e-9) + 1e-9, history
    # final centroids sit on the blob means (noise mean is 0 by symmetry
    # of the (k%5 - 2) pattern over 20 samples -> near, not exact)
    for c in centers:
        assert any(
            math.dist(c, fc) < 1.0 for fc in final
        ), (c, final)


def test_kmeans_validates_inputs(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        lloyd_kmeans(df, k=0)
    with pytest.raises(ValueError):
        lloyd_kmeans(df, k=5, iterations=2)  # fewer rows than k


def test_assign_clusters_ties_break_low(spark):
    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>")
    out = assign_clusters(df, [[1.0], [-1.0]], "embedding").collect()[0]
    assert out.cluster == 1 and out.dist2 == 1.0


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_ohlc_bars_first_last_by_time_then_id(spark, monkeypatch, tmp_path):
    import datetime as dt

    from books2scrape_etl_spark import query_defs12 as q12

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # same hour; two events share a second -> event_id breaks the tie
        (7, base.replace(minute=1), 1, "a", 5.0),
        (3, base.replace(minute=1), 1, "a", 9.0),   # same ts, lower id -> open
        (9, base.replace(minute=50), 1, "a", 2.0),  # latest -> close
        (5, base.replace(minute=20), 1, "a", 11.0),
        # next hour, separate bar
        (1, base.replace(hour=1, minute=0), 1, "a", 4.0),
    ]
    df = _events_df(spark, rows)
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    out = {r.bucket_es: r for r in q12.q_ohlc_bars(spark, "unused").collect()}
    assert len(out) == 2
    first = out[min(out)]
    assert (first.open, first.close) == (9.0, 2.0)
    assert (first.high, first.low, first.volume) == (11.0, 2.0, 4)
    assert first.turnover == pytest.approx(27.0)


def test_ohlc_bars_order_key_guard(spark, monkeypatch):
    import datetime as dt

    from books2scrape_etl_spark import query_defs12 as q12

    df = _events_df(spark, [(1_000_000, dt.datetime(2024, 1, 1), 1, "a", 1.0)])
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    with pytest.raises(Exception, match="overflows the order key"):
        q12.q_ohlc_bars(spark, "unused").collect()


def test_ts_gapfill_grid_and_locf(spark, monkeypatch):
    import datetime as dt

    from books2scrape_etl_spark import query_defs12 as q12

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, base, 0, "a", 1.5),                       # hour 10
        (2, base.replace(minute=30), 0, "a", 2.5),    # hour 10
        (3, base.replace(hour=13), 0, "a", 7.0),      # hour 13 (11, 12 are gaps)
    ]
    df = _events_df(spark, rows)
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    out = sorted(q12.q_ts_gapfill(spark, "unused").collect(), key=lambda r: r.hour_es)
    assert len(out) == 4  # hours 10..13 inclusive — gaps densified
    assert [r.n_events for r in out] == [2, 0, 0, 1]
    assert [r.is_gap for r in out] == [0, 1, 1, 0]
    assert [r.locf_value for r in out] == [4.0, 4.0, 4.0, 7.0]
    assert out[0].hour_es % 3600 == 0


def test_rolling_active_window_law(spark, monkeypatch):
    import datetime as dt

    from books2scrape_etl_spark import query_defs12 as q12

    day0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, day0, 10, "a", 0.0),
        (2, day0, 11, "a", 0.0),                        # day 0: users 10, 11
        (3, day0 + dt.timedelta(days=3), 10, "a", 0.0), # day 3: user 10
        (4, day0 + dt.timedelta(days=8), 12, "a", 0.0), # day 8: user 12
    ]
    df = _events_df(spark, rows)
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    got = {r.day: (r.dau, r.wau) for r in q12.q_rolling_active(spark, "unused").collect()}
    d0 = day0.timestamp() // 86400
    # day 0..6 all carry day-0's two users; day 3 adds nothing new (10 again)
    assert got[d0] == (2, 2)
    assert got[d0 + 3] == (1, 2)
    assert got[d0 + 6] == (0, 2)
    # day 7,8: day-0 users aged out; day-3's user 10 covers 3..9
    assert got[d0 + 7] == (0, 1)
    assert got[d0 + 8] == (1, 2)
    # windows are [d, d+6]: nothing before day 0, trailing partials kept
    assert min(got) == d0 and max(got) == d0 + 8 + 6


def test_robust_outliers_mad_math(spark, monkeypatch):
    import datetime as dt

    from books2scrape_etl_spark import query_defs12 as q12

    base = dt.datetime(2024, 1, 1)
    # values 1..9 (med=5, adev med=2) plus one wild point at 1000
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    rows = [(i, base, 0, "a", v) for i, v in enumerate(vals)]
    df = _events_df(spark, rows)
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    out = q12.q_robust_outliers(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.med, r.n) == (5.5, 10)  # interpolated median of 10 values
    # adevs: 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5 -> mad 2.5
    assert r.mad == 2.5
    assert r.n_outliers == 1  # only the wild point exceeds 3*mad=7.5


def test_quantile_normalize_bounds_and_monotone(spark, monkeypatch):
    import datetime as dt

    from books2scrape_etl_spark import query_defs12 as q12

    base = dt.datetime(2024, 1, 1)
    # all user_id 0 so every row survives the output filter
    rows = [(i, base, 0, "a", float(v)) for i, v in enumerate([5.0, 1.0, 9.0, 3.0])]
    df = _events_df(spark, rows)
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    out = sorted(q12.q_quantile_normalize(spark, "unused").collect(), key=lambda r: r.value)
    assert [r.q for r in out] == [0.0, 1 / 3, 2 / 3, 1.0]


def test_gini_diversity_math(spark, monkeypatch):
    import datetime as dt

    from books2scrape_etl_spark import query_defs12 as q12

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 0: 3 of 'a', 1 of 'b' -> gini = 1 - (9+1)/16 = 0.375
        (1, base, 0, "a", 0.0), (2, base, 0, "a", 0.0),
        (3, base, 0, "a", 0.0), (4, base, 0, "b", 0.0),
        # user 1: single type -> gini 0
        (5, base, 1, "c", 0.0), (6, base, 1, "c", 0.0),
    ]
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: _events_df(spark, rows))
    got = {r.user_id: r for r in q12.q_gini_diversity(spark, "unused").collect()}
    assert (got[0].n_events, got[0].n_types, got[0].gini) == (4, 2, 0.375)
    assert (got[1].n_events, got[1].n_types, got[1].gini) == (2, 1, 0.0)


def test_source_overlap_jaccard(spark, monkeypatch):
    from books2scrape_etl_spark import query_defs12 as q12

    docs = [
        (1, "red green blue", "en", "s1", 1),
        (2, "green blue yellow", "en", "s2", 1),
        (3, "purple", "en", "s3", 1),
        (4, "blue red green", "en", "s1", 1),  # dup tokens collapse per source
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    out = {(r.src_a, r.src_b): r for r in q12.q_source_overlap(spark, "unused").collect()}
    # s1={red,green,blue}, s2={green,blue,yellow}: inter 2, union 4
    r = out[("s1", "s2")]
    assert (r.n_common, r.nv_a, r.nv_b) == (2, 3, 3)
    assert r.jaccard == 0.5
    # s3 shares nothing -> absent (inner-join semantics, documented)
    assert set(out) == {("s1", "s2")}


def test_feature_hashing_md5_parity_and_counts(spark, monkeypatch):
    import hashlib

    from books2scrape_etl_spark import query_defs12 as q12

    docs = [(0, "red red green", "en", "s1", 1), (17, "blue", "en", "s1", 1),
            (3, "never vectorized", "en", "s1", 1)]  # fails the % 17 filter
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    out = q12.q_feature_hashing(spark, "unused").collect()
    b = lambda w: hashlib.md5(w.encode()).hexdigest()[:2]  # noqa: E731
    got = {(r.doc_id, r.bucket): r.tf for r in out}
    assert got == {(0, b("red")): 2, (0, b("green")): 1, (17, b("blue")): 1}


def test_grouped_regression_exact_line(spark, monkeypatch):
    import datetime as dt

    from books2scrape_etl_spark import query_defs12 as q12

    epoch0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    # y = 2x + 5 exactly, x in small integers -> closed form is exact
    for i, xsec in enumerate([0, 10, 20, 40, 80]):
        rows.append(
            (i, (epoch0 + dt.timedelta(seconds=xsec)).replace(tzinfo=None), 0, "a", 2.0 * xsec + 5.0)
        )
    # a second group with a flat line y = 7
    for i, xsec in enumerate([0, 30, 60]):
        rows.append((10 + i, (epoch0 + dt.timedelta(seconds=xsec)).replace(tzinfo=None), 0, "b", 7.0))
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: _events_df(spark, rows))
    got = {r.event_type: r for r in q12.q_grouped_regression(spark, "unused").collect()}
    assert (got["a"].slope, got["a"].intercept) == (2.0, 5.0)
    assert (got["b"].slope, got["b"].intercept) == (0.0, 7.0)
    assert (got["a"].n, got["b"].n) == (5, 3)


def test_pmi_ratio_ranks_association(spark, monkeypatch):
    from books2scrape_etl_spark import query_defs12 as q12

    # "aa bb" always co-occur (perfect association); "cc" is frequent
    # but pairs with everything (low association)
    docs = [(i, "aa bb cc dd", "en", "t", 10) for i in range(3)]
    docs += [(100 + i, "cc dd cc ee", "en", "t", 10) for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    monkeypatch.setattr(q12, "read_table", lambda s, n, d: df)
    out = q12.q_pmi_collocations(spark, "unused").collect()
    assert out, "no collocations found"
    assert [r.rnk for r in out] == list(range(1, len(out) + 1))
    by_pair = {(r.w1, r.w2): r for r in out}
    assert ("aa", "bb") in by_pair
    # exclusive pair beats the promiscuous token's pairs
    assert by_pair[("aa", "bb")].ratio == max(r.ratio for r in out)
    # spot-check the exact ratio: cxy=3, cx=3, cy=3, nu=24, nb=18
    r = by_pair[("aa", "bb")]
    assert r.ratio == pytest.approx((3 * 24 * 24) / (3 * 3 * 18))
