"""Round-8 packing-suite tests: each query_defs33 suite must be the
exact union of its singles — per-section row counts match the singles,
and a spot-checked section is value-identical after normalization.
Also pins the udtf_sentences invariant conversion (both checks 1)."""

from pyspark.sql import functions as F

from books2scrape_etl_spark.query_defs33 import (
    _W12,
    _W12_SECTIONS,
    _W22,
    _W22_SECTIONS,
)
from books2scrape_etl_spark.queries import QUERIES
from books2scrape_etl_spark.suites import sect_df as _sect_df


def test_suite_sections_match_single_counts(spark, sf_dir):
    for suite, sections in [
        ("wave12_suite", _W12_SECTIONS),
        ("wave22_suite", _W22_SECTIONS),
    ]:
        got = {
            r["sec"]: r["n"]
            for r in QUERIES[suite](spark, sf_dir)
            .groupBy("sec")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for name in sections:
            want = QUERIES[name](spark, sf_dir).count()
            assert got.get(name) == want, (suite, name, got.get(name), want)


def test_suite_section_values_identical(spark, sf_dir):
    """wave22_suite's hhi section must be bit-identical to the single
    run through the same slot normalization."""
    suite = (
        QUERIES["wave22_suite"](spark, sf_dir)
        .where(F.col("sec") == "hhi_by_segment")
        .collect()
    )
    single = _sect_df(
        spark, sf_dir, "hhi_by_segment", _W22, _W22_SECTIONS["hhi_by_segment"]
    ).collect()
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    assert sorted(map(key, suite)) == sorted(map(key, single))


def test_wave12_suite_width_covers_all_sections():
    """Every slot a section maps must exist in the suite width (a typo
    would silently project NULLs on one side only)."""
    slots = {s for s, _ in _W12}
    for name, mapping in _W12_SECTIONS.items():
        missing = set(mapping) - slots
        assert not missing, (name, missing)


def test_udtf_sentences_invariants(spark, sf_dir):
    rows = {r["check_name"]: r["ok"] for r in QUERIES["udtf_sentences"](spark, sf_dir).collect()}
    assert rows == {"rowcount_match": 1, "symmetric_diff_zero": 1}
