"""Wave-30 unit/property tests: bootstrap replica weights/means vs a
hashlib replay (plus CI sanity laws), and keep-best survivor policy
vs a pure-Python pick."""

import hashlib
import re
from collections import defaultdict

import pyarrow.parquet as pq

from books2scrape_etl_spark.query_defs30 import (
    _BOOT_B,
    _POIS_T0,
    _POIS_T1,
    _POIS_T2,
    q_bootstrap_se,
    q_dedup_keep_best,
)


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _wt(h):
    return 0 if h < _POIS_T0 else 1 if h < _POIS_T1 else 2 if h < _POIS_T2 else 3


def test_bootstrap_matches_replay(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    means = []
    for b in range(_BOOT_B):
        sw = swc = 0
        for r in o.itertuples():
            w = _wt(_h32(f"{r.o_orderkey}:{b}"))
            sw += w
            swc += w * r.cents
        means.append(float(swc) / float(sw))
    rows = q_bootstrap_se(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n"] == len(o)
    assert r["mean_full"] == float(o["cents"].sum()) / float(len(o))
    assert r["n_replicas"] == _BOOT_B
    assert r["boot_min"] == min(means)
    assert r["boot_max"] == max(means)
    # CI laws: ordered, inside [min, max], and straddling the truth
    # for a well-behaved mean at this scale
    assert r["boot_min"] <= r["ci_lo"] <= r["ci_hi"] <= r["boot_max"]
    assert r["ci_lo"] <= r["mean_full"] <= r["ci_hi"]
    # weights are Poisson(1)-ish: average effective n within 10% of n
    # (deterministic given the hash — this pins the threshold constants)
    avg_eff = sum(
        sum(_wt(_h32(f"{k}:{b}")) for k in o["o_orderkey"].values[:200])
        for b in range(4)
    ) / (4 * 200)
    assert 0.85 <= avg_eff <= 1.15


def test_keep_best_matches_python(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    best = {}
    for r in docs.itertuples():
        norm = re.sub(r"[^a-z0-9]+", " ", r.text.lower()).strip()
        fp = hashlib.md5(norm.encode()).hexdigest()
        key = (-r.n_chars, r.doc_id)
        if fp not in best or key < best[fp][0]:
            best[fp] = (key, r.source, r.n_chars)
    exp = defaultdict(lambda: [0, 0])
    for _, src, nc in best.values():
        exp[src][0] += 1
        exp[src][1] += nc
    rows = q_dedup_keep_best(spark, sf_dir).collect()
    assert {r["source"]: [r["n_survivors"], r["chars_kept"]] for r in rows} == dict(
        exp
    )
    # keep-best never keeps more than one copy per fingerprint
    assert sum(v[0] for v in exp.values()) == len(best)
