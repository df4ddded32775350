"""Wave-36 tests: C4-style global line-level dedup (query_defs36)."""

import hashlib

from books2scrape_etl_spark.query_defs36 import _PLANTED, _SEG_A, _SEG_B, _SEG_C
from books2scrape_etl_spark.queries import QUERIES


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_planted_docs_dedup_exactly(spark, sf_dir):
    """Keep-first on (doc_id, line_no): doc -2 (smallest id) owns seg A,
    keeps its first copy and drops its within-doc repeat; doc -1 loses
    A entirely and keeps only B. Reassembly preserves line order."""
    out = {
        r["doc_id"]: r
        for r in QUERIES["line_dedup"](spark, sf_dir).where("doc_id < 0").collect()
    }
    assert set(out) == {-1, -2}
    assert out[-2]["n_lines"] == 3 and out[-2]["n_kept"] == 2
    assert out[-1]["n_lines"] == 2 and out[-1]["n_kept"] == 1
    assert out[-2]["out_md5"] == _md5(f"{_SEG_A} {_SEG_C}")
    assert out[-1]["out_md5"] == _md5(_SEG_B)


def test_organic_docs_complete_and_consistent(spark, sf_dir):
    """Every organic doc appears exactly once, n_kept <= n_lines, and
    a doc with zero kept lines hashes the empty string."""
    import duckdb

    rows = QUERIES["line_dedup"](spark, sf_dir).where("doc_id >= 0").collect()
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert len(rows) == n_docs
    assert all(0 <= r["n_kept"] <= r["n_lines"] for r in rows)
    empty_md5 = _md5("")
    for r in rows:
        if r["n_kept"] == 0:
            assert r["out_md5"] == empty_md5


def test_planted_segments_are_aligned_lines():
    """The planted texts must decompose into whole 10-word segments —
    a word-count drift would silently misalign every expectation."""
    for _, text in _PLANTED:
        words = text.split(" ")
        assert len(words) % 10 == 0
    for seg in (_SEG_A, _SEG_B, _SEG_C):
        assert len(seg.split(" ")) == 10
