"""Gopher-style repetition-filter tests: hand-computed fractions on
crafted documents, plus threshold behavior."""

from books2scrape_etl_spark.operators.text import repetition_stats

DOCS = [
    # 1: "a b a b a b" -> n=6, nd=2, top word 'a'(3), top bigram: "a b"x3 of 5
    (1, "a b a b a b"),
    # 2: all distinct words, all distinct bigrams
    (2, "one two three four five"),
    # 3: single word
    (3, "solo"),
    # 4: pure repetition
    (4, "spam spam spam spam"),
]


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").coalesce(1)
    got = {r.doc_id: r for r in repetition_stats(df).collect()}

    r1 = got[1]
    assert r1.n_words == 6
    assert r1.dup_word_frac == (6 - 2) / 6
    assert r1.top_word_frac == 3 / 6
    assert r1.top_bigram_frac == 3 / 5
    assert not r1.keep

    r2 = got[2]
    assert r2.n_words == 5
    assert r2.dup_word_frac == 0.0
    assert r2.top_word_frac == 1 / 5
    assert r2.top_bigram_frac == 1 / 4
    assert not r2.keep  # top_bigram_frac 0.25 > 0.1

    r3 = got[3]
    assert r3.n_words == 1
    assert r3.dup_word_frac == 0.0
    assert r3.top_word_frac == 1.0
    assert r3.top_bigram_frac == 0.0  # no bigrams -> 0/1

    r4 = got[4]
    assert r4.dup_word_frac == 3 / 4
    assert r4.top_word_frac == 1.0
    assert not r4.keep


def test_repetition_stats_thresholds(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").coalesce(1)
    lax = {
        r.doc_id: r.keep
        for r in repetition_stats(
            df, max_dup_word_frac=1.0, max_top_word_frac=1.0, max_top_bigram_frac=1.0
        ).collect()
    }
    assert all(lax.values())  # thresholds at 1.0 keep everything
