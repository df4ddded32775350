"""Differential test: every oracle-paired qname must match DuckDB."""

import pytest

from books2scrape_etl_spark.queries import ORACLE_SQL, QUERIES
from tests.oracle import compare, run_oracle


@pytest.mark.parametrize("qname", sorted(ORACLE_SQL))
def test_oracle_match(spark, sf_dir, qname):
    sdf = QUERIES[qname](spark, sf_dir)
    odf = run_oracle(ORACLE_SQL[qname], sf_dir)
    problems = compare(sdf, odf)
    assert not problems, f"{qname}: {problems}"


def test_all_queries_return_rows(spark, sf_dir):
    for qname, fn in QUERIES.items():
        n = fn(spark, sf_dir).count()
        assert n >= 0, qname
