"""Wave-32 unit/property tests: FD audit vs a dict re-derivation and
the holds-iff-zero-violations law; CUSUM vs a NumPy float replay plus
the scaled-integer-equals-scaled-float law."""

import numpy as np
import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs32 import q_change_point, q_fd_audit

_EPOCH_DAY = lambda t: int(t.value // 10**9) // 86400  # noqa: E731


def test_fd_audit_matches_dicts(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_orderkey", "l_returnflag"],
    ).to_pandas()
    rows = {r["fd"]: r for r in q_fd_audit(spark, sf_dir).collect()}
    for fd, (lhs, rhs) in {
        "l_partkey->l_suppkey": ("l_partkey", "l_suppkey"),
        "l_orderkey->l_returnflag": ("l_orderkey", "l_returnflag"),
    }.items():
        card = li.groupby(lhs)[rhs].nunique()
        r = rows[fd]
        assert r["n_keys"] == len(card)
        assert r["n_violating_keys"] == int((card > 1).sum())
        assert r["max_rhs_cardinality"] == int(card.max())
        assert r["violation_share"] == float((card > 1).sum()) / float(len(card))
        # the audit law: FD holds <=> zero violating keys <=> max card 1
        assert (r["n_violating_keys"] == 0) == (r["max_rhs_cardinality"] == 1)
    # data-model expectation: parts have multiple suppliers
    assert rows["l_partkey->l_suppkey"]["n_violating_keys"] > 0


def test_change_point_matches_numpy(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderdate"]
    ).to_pandas()
    o["day"] = o["o_orderdate"].map(_EPOCH_DAY)
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    daily = o.groupby("day")["cents"].sum().sort_index()
    n, s = len(daily), int(daily.sum())
    p = daily.cumsum().values
    i = np.arange(1, n + 1)
    stat = np.abs(n * p.astype(object) - i.astype(object) * s)  # exact ints
    peak = max(stat)
    cp_idx = int(np.argmax(stat == peak))  # first (min-day) attaining it
    rows = q_change_point(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_days"], r["total_cents"]) == (n, s)
    assert r["cusum_peak"] == peak
    assert r["cp_day"] == int(daily.index[cp_idx])
    # scaled-integer form == n * classic float CUSUM (up to float error)
    classic = np.abs(p - i * (s / n)).max()
    assert abs(peak / n - classic) < 1e-3 * max(classic, 1.0)
