"""Report layer tests: summary contract, HTML render, gate, SMTP no-op."""

import pytest

from books2scrape_etl_spark.plans.report import (
    SUMMARY_KEYS,
    quality_gate,
    render_html_report,
    run_report,
    send_report,
)
from tests.fixtures import books_raw_df


def test_render_html_contains_all_keys():
    summary = dict.fromkeys(SUMMARY_KEYS, 1)
    html = render_html_report(summary, generated_at="2026-01-01")
    for k in SUMMARY_KEYS:
        assert k in html
    assert html.startswith("<html>")


def test_render_html_missing_key_raises():
    with pytest.raises(KeyError):
        render_html_report({"total_books": 1})  # airflow.py:123-126 analogue


def test_quality_gate(spark):
    with pytest.raises(ValueError):
        quality_gate(spark.createDataFrame([], "a int"))


def test_send_report_noop_without_config(monkeypatch):
    monkeypatch.delenv("SMTP_HOST", raising=False)
    monkeypatch.delenv("SMTP_PASSWORD", raising=False)
    assert send_report("<html></html>") is False


def test_run_report_end_to_end(spark, monkeypatch):
    monkeypatch.delenv("SMTP_HOST", raising=False)
    from books2scrape_etl_spark.plans.books import clean_books

    cleaned = clean_books(books_raw_df(spark))
    summary = run_report(cleaned)
    assert set(summary) == set(SUMMARY_KEYS)
    assert summary["total_books"] > 0


def test_observed_pipeline_metrics(spark):
    from books2scrape_etl_spark.plans.books import clean_books
    from books2scrape_etl_spark.plans.report import observed_pipeline
    from tests.fixtures import BOOKS_RAW_ROWS

    cleaned = clean_books(books_raw_df(spark))
    observed, obs = observed_pipeline(cleaned)
    n = observed.count()  # the action the metrics piggyback on
    assert obs.get["rows_seen"] == n == len(BOOKS_RAW_ROWS)
    assert obs.get["inventory_total"] > 0
