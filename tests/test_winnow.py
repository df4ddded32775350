"""Winnowing fingerprint tests: Spark vs an independent pure-Python
reference, the winnowing containment guarantee, and candidate pairing
on planted partial overlaps."""

import hashlib
import re

from books2scrape_etl_spark.operators.winnow import (
    winnow_candidates,
    winnow_fingerprints,
)

K, W = 8, 8


def ref_fps(text: str, k: int = K, w: int = W) -> set:
    """Naive reference: same normalize/hash/window rules, written the
    slow obvious way (independent of both Spark and DuckDB)."""
    t = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    if len(t) < k:
        return set()
    hs = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(t) - k + 1)
    ]
    return {min(hs[max(0, e - w + 1) : e + 1]) for e in range(len(hs))}


DOCS = [
    (1, "The quick brown fox jumps over the lazy dog, twice over."),
    (2, "Pack my box with five dozen liquor jugs -- pangram number two!"),
    (3, "short"),  # < k after normalization: no fingerprints
    (4, ""),  # empty
    (5, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # degenerate: one distinct gram
]


def test_winnow_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").coalesce(1)
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    want = {i: ref_fps(t) for i, t in DOCS if ref_fps(t)}
    assert got == want
    assert 3 not in got and 4 not in got  # short/empty docs emit nothing
    assert len(got[5]) == 1  # single repeated gram -> one fingerprint


def test_winnow_guarantee_shared_substring(spark):
    # Winnowing guarantee: a shared substring of length >= k + w - 1
    # contains at least one full window, so both docs select a
    # fingerprint from it -> non-empty intersection.
    shared = "zqxjkvbwpfmg htrdlncys"  # 22 chars > k + w - 1 = 15
    a = (10, f"left padding text one {shared} right tail alpha")
    b = (11, f"completely different preamble {shared} and another ending")
    df = spark.createDataFrame([a, b], "doc_id long, text string").coalesce(1)
    fps: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[10] & fps[11]
    # and the reference agrees on both sets
    assert fps[10] == ref_fps(a[1]) and fps[11] == ref_fps(b[1])


def test_winnow_candidates_planted_overlap(spark):
    core = "the shared plagiarized passage appears verbatim in both essays"
    rows = [
        (1, f"essay one begins here. {core} and then concludes differently."),
        (2, f"a second submission: {core} with its own framing around it."),
        (3, "an unrelated document about winnowing sliding windows of hashes."),
        (4, "another independent text mentioning foxes and liquor jugs only."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    pairs = {
        (r.id_a, r.id_b): r.shared
        for r in winnow_candidates(df, max_df=50, min_shared=3).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] >= 3
    assert all(a < b for a, b in pairs)
    assert (3, 4) not in pairs
    # shared counts bounded by each doc's own fingerprint count
    fps: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    for (a, b), n in pairs.items():
        assert n == len(fps[a] & fps[b])


def test_decontaminate_planted_leak(spark):
    from pyspark.sql import functions as F

    from books2scrape_etl_spark.operators.winnow import decontaminate

    leak = "the exact benchmark passage that must not appear in training data"
    rows = [
        (0, f"benchmark item: {leak} end of item."),  # bench (id % 2 == 0 pred)
        (1, f"a training document which copied {leak} word for word."),
        (3, "a clean training document with entirely original content here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    out = {r.doc_id: r.n_shared for r in decontaminate(df, F.col("doc_id") % 2 == 0).collect()}
    assert 1 in out and out[1] >= 3  # the copier is flagged
    assert 3 not in out  # the clean doc is not
