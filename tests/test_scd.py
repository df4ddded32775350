"""SCD2 upsert unit tests: change/close/version, no-op idempotence,
inserts, NULL transitions (null-safe comparison), and history
pass-through."""

from pyspark.sql import functions as F

from books2scrape_etl_spark.operators.scd import scd2_apply


def _dim(spark):
    rows = [
        # key, attr (untracked), val (tracked), version, is_current
        (1, "a", 10.0, 1, True),
        (2, "b", 20.0, 1, True),
        (3, "c", None, 1, True),
        (4, "d", 40.0, 1, True),
        # closed history row for key 4 (earlier version)
        (4, "d", 39.0, 0, False),
    ]
    return spark.createDataFrame(
        rows, "k long, attr string, val double, version int, is_current boolean"
    )


def _updates(spark):
    rows = [
        (1, 11.0),  # changed
        (2, 20.0),  # no-op
        (3, 30.0),  # NULL -> value is a real change (null-safe)
        (9, 90.0),  # brand-new key
    ]
    return spark.createDataFrame(rows, "k long, val double")


def test_scd2_semantics(spark):
    out = scd2_apply(
        _dim(spark), _updates(spark), ["k"], ["val"], new_version=2
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.k, []).append(r)

    # key 1: closed v1 + open v2 with the new value, attr inherited
    k1 = sorted(by[1], key=lambda r: r.version)
    assert [(r.version, r.is_current, r.val, r.attr) for r in k1] == [
        (1, False, 10.0, "a"),
        (2, True, 11.0, "a"),
    ]
    # key 2: no-op update leaves the single open row untouched
    assert [(r.version, r.is_current, r.val) for r in by[2]] == [(1, True, 20.0)]
    # key 3: NULL -> 30.0 is a change under null-safe comparison
    k3 = sorted(by[3], key=lambda r: r.version)
    assert [(r.version, r.is_current, r.val) for r in k3] == [
        (1, False, None),
        (2, True, 30.0),
    ]
    # key 4: no update; open row untouched AND closed history preserved
    assert sorted((r.version, r.is_current) for r in by[4]) == [(0, False), (1, True)]
    # key 9: fresh insert, untracked attr NULL
    assert [(r.version, r.is_current, r.val, r.attr) for r in by[9]] == [
        (2, True, 90.0, None)
    ]


def test_scd2_idempotent_reapply(spark):
    once = scd2_apply(_dim(spark), _updates(spark), ["k"], ["val"], new_version=2)
    # re-applying the SAME updates to the new state creates no new
    # versions: every open row already equals its update.
    twice = scd2_apply(once, _updates(spark), ["k"], ["val"], new_version=3)
    assert twice.where(F.col("version") == 3).count() == 0
    from collections import Counter

    a = Counter(map(tuple, once.collect()))
    b = Counter(map(tuple, twice.collect()))
    assert a == b
