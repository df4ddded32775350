import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from books2scrape_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Explicit perf-entry freeze (ADVICE r8: not an import side effect):
    # test_plans.py builds plans for the whole registry — without the
    # freeze that's 2.5-4x slower (GC scans the ~100k-object registry
    # heap on every pass). Deliberate tradeoff: pytest internals alive
    # at this point get frozen too; the suite is a one-shot process.
    from books2scrape_etl_spark.queries import freeze_registry_heap

    freeze_registry_heap()
    s = get_spark(app_name="tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    # Ship the package zip to executor Python workers (same path the
    # driver contract uses) so UDF-bearing tests pass regardless of the
    # pytest working directory — local-mode workers inherit the driver
    # cwd and otherwise fail to unpickle module-referenced callables.
    import __spark_entry__

    __spark_entry__._ship_package(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
