"""Wave-38 (CBO join reordering) unit tests: conf-guard restore
semantics (normal + exception paths), land-once table landing, and the
testdata preflight's content-drift detection. The value/plan evidence
lives in the oracle sweep + tests/test_plans.py; these pin the
plumbing the qname relies on."""

import pytest

from books2scrape_etl_spark.query_defs38 import (
    _CBO_CONFS,
    cbo_conf_guard,
    land_cbo_tables,
)


def _read_confs(spark):
    return {k: spark.conf.get(k, None) for k in _CBO_CONFS}


def test_cbo_conf_guard_restores(spark):
    before = _read_confs(spark)
    with cbo_conf_guard(spark):
        inside = _read_confs(spark)
        assert inside == {k: "true" for k in _CBO_CONFS}
    assert _read_confs(spark) == before


def test_cbo_conf_guard_restores_on_exception(spark):
    before = _read_confs(spark)
    with pytest.raises(RuntimeError):
        with cbo_conf_guard(spark):
            raise RuntimeError("boom")
    assert _read_confs(spark) == before


def test_cbo_conf_guard_restores_preexisting_value(spark):
    # a conf the session had EXPLICITLY set must come back to that
    # value, not be unset
    key = "spark.sql.cbo.enabled"
    spark.conf.set(key, "false")
    try:
        with cbo_conf_guard(spark):
            assert spark.conf.get(key) == "true"
        assert spark.conf.get(key) == "false"
    finally:
        spark.conf.unset(key)


def test_land_cbo_tables_lands_once(spark, sf_dir):
    # second call must reuse the session's landed+ANALYZEd tables (the
    # query_defs37 land-once rule: no overwrite under a live lazy scan)
    names1 = land_cbo_tables(spark, sf_dir)
    li = spark.table(names1[0])
    n_before = li.count()
    names2 = land_cbo_tables(spark, sf_dir)
    assert names1 == names2
    # the previously returned scan still reads the same landed data
    assert li.count() == n_before
    # stats landed in the catalog (what CostBasedJoinReorder consumes);
    # plan stats only surface rowCount with CBO on, hence the guard
    with cbo_conf_guard(spark):
        stats = spark.table(names1[0])._jdf.queryExecution().optimizedPlan().stats()
        assert stats.rowCount().isDefined(), "ANALYZE stats missing"
        assert int(str(stats.rowCount().get())) == n_before


def test_check_testdata_diff_flags_content_drift():
    # a schema-identical regeneration must still be a loud diff
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_testdata",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "check_testdata.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = {"sf0.01": {"documents": {"doc_id": "int64", "__content__": "10:aa"}}}
    new = {"sf0.01": {"documents": {"doc_id": "int64", "__content__": "10:bb"}}}
    msgs = mod.diff(old, new)
    assert msgs and "__content__" in msgs[0]
    assert mod.diff(old, old) == []
