"""Unit tests for the wave-5 wired operators (VERDICT r3 item 4):
context-window chunking boundary contract and PII redaction with
planted PII. The oracle-paired driver rows verify end-to-end values;
these pin the per-case semantics a hash can't explain when it breaks.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from books2scrape_etl_spark.operators.chunking import chunk_docs
from books2scrape_etl_spark.operators.privacy import pii_stats, redact_text


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


class TestChunkDocs:
    def test_boundary_contract(self, spark):
        # 10 words, chunk_words=4, overlap=1 -> stride 3 -> starts 0,3,6,9
        words = [f"w{i}" for i in range(10)]
        out = chunk_docs(
            _docs(spark, [" ".join(words)]), chunk_words=4, overlap=1
        ).orderBy("chunk_id").collect()
        assert [r.chunk_start for r in out] == [0, 3, 6, 9]
        assert [r.chunk_id for r in out] == [0, 1, 2, 3]
        assert out[0].chunk_text == "w0 w1 w2 w3"
        assert out[1].chunk_text == "w3 w4 w5 w6"
        # final chunk is the short tail, never padded, never dropped
        assert out[3].chunk_text == "w9"
        assert [r.n_words for r in out] == [4, 4, 4, 1]

    def test_short_doc_single_chunk(self, spark):
        out = chunk_docs(_docs(spark, ["only two"]), chunk_words=64, overlap=16).collect()
        assert len(out) == 1
        assert out[0].chunk_text == "only two"
        assert out[0].n_words == 2

    def test_overlap_windows_share_words(self, spark):
        text = " ".join(str(i) for i in range(100))
        out = chunk_docs(_docs(spark, [text]), chunk_words=10, overlap=4).orderBy(
            "chunk_id"
        ).collect()
        first, second = out[0].chunk_text.split(), out[1].chunk_text.split()
        assert first[-4:] == second[:4]  # the 4-word overlap

    def test_every_word_covered(self, spark):
        text = " ".join(f"t{i}" for i in range(57))
        rows = chunk_docs(_docs(spark, [text]), chunk_words=8, overlap=2).collect()
        covered = {w for r in rows for w in r.chunk_text.split()}
        assert covered == {f"t{i}" for i in range(57)}

    def test_invalid_overlap_rejected(self, spark):
        with pytest.raises(ValueError):
            chunk_docs(_docs(spark, ["x"]), chunk_words=4, overlap=4)


class TestPrivacy:
    PII_TEXT = (
        "write to jane.doe+spam@corp.example.org, call 415-555-0199, "
        "ssn 123-45-6789, card 4111-1111-1111-1111, server 192.168.0.17 done"
    )

    def test_all_categories_redacted(self, spark):
        out = (
            _docs(spark, [self.PII_TEXT])
            .select(redact_text("text").alias("r"))
            .collect()[0]
            .r
        )
        assert out == (
            "write to [EMAIL], call [PHONE], ssn [SSN], card [CARD], "
            "server [IPV4] done"
        )

    def test_counts_per_category(self, spark):
        row = pii_stats(_docs(spark, [self.PII_TEXT])).collect()[0]
        assert (
            row.email_hits,
            row.phone_hits,
            row.ssn_hits,
            row.card_hits,
            row.ipv4_hits,
        ) == (1, 1, 1, 1, 1)

    def test_clean_text_untouched(self, spark):
        clean = "a perfectly ordinary sentence with numbers 12 34 and a dot."
        row = pii_stats(_docs(spark, [clean])).collect()[0]
        assert row.redacted == clean
        assert row.email_hits + row.card_hits + row.ssn_hits == 0
        assert row.phone_hits + row.ipv4_hits == 0

    def test_card_consumed_before_phone(self, spark):
        # a space-grouped card must become [CARD], not partially [PHONE]
        out = (
            _docs(spark, ["pay 4012 8888 8888 1881 now"])
            .select(redact_text("text").alias("r"))
            .collect()[0]
            .r
        )
        assert out == "pay [CARD] now"

    def test_multiple_hits_counted(self, spark):
        row = pii_stats(
            _docs(spark, ["a@b.io c@d.io and 10.0.0.1 10.0.0.2 10.0.0.3"])
        ).collect()[0]
        assert row.email_hits == 2
        assert row.ipv4_hits == 3
