"""Slowly-changing-dimension type-2 upsert — the MERGE-shaped ETL
operator a warehouse pipeline applies to its dimensions (the reference
rebuilds its whole star from scratch every run, airflow.py:31; SCD2 is
what replaces that full rebuild once dimensions carry history).

``scd2_apply`` takes the current dimension (each row carrying a version
number and an is_current flag) plus an updates table, and emits the
next dimension state:

- unmatched current rows pass through unchanged;
- matched rows whose tracked columns all equal the update pass through
  unchanged (idempotence — re-applying the same update is a no-op);
- matched rows with a tracked difference are CLOSED (is_current=false,
  version kept) and a new open version row is appended;
- update keys absent from the dimension are inserted as new open rows.

Versioning is an integer stamp supplied by the caller — never a
wall-clock read — so the operation is deterministic and replayable
(the property both the differential oracle and idempotent re-runs
need; production callers pass their batch/run id).

Scale notes (100 TB posture): one left join from dim to updates on the
key — updates are usually a tiny fraction of the dimension, so AQE
broadcasts them and the dimension never shuffles; the two output
branches (pass-through/closed + new versions) are projections of that
single join, unioned without further exchange. Null-safe comparison
(``eqNullSafe``) on every tracked column means NULL→value and
value→NULL transitions are real changes, and NULL==NULL is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    new_version: int,
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply SCD2 updates; returns the full next dimension state with
    the same schema as ``dim``. ``updates`` carries the key and tracked
    columns only; untracked attribute columns are inherited from the
    matched dimension row."""
    u_cols = key_cols + tracked_cols
    u = updates.select(*[F.col(c).alias(f"__u_{c}") for c in u_cols])
    cond = [F.col(k) == F.col(f"__u_{k}") for k in key_cols]
    j = dim.where(F.col(current_col)).join(u, cond, "full_outer")

    matched = F.col(f"__u_{key_cols[0]}").isNotNull() & F.col(key_cols[0]).isNotNull()
    differs: Column = F.lit(False)
    for c in tracked_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    changed = matched & differs
    insert = F.col(key_cols[0]).isNull()

    dim_cols = dim.columns
    # branch 1: existing rows — closed when changed, untouched otherwise
    existing = j.where(~insert).select(
        *[
            F.when(changed, F.lit(False)).otherwise(F.col(c)).alias(c)
            if c == current_col
            else F.col(c)
            for c in dim_cols
        ]
    )
    # branch 2: new versions for changed rows (inherit untracked attrs)
    new_versions = j.where(changed).select(
        *[
            F.col(f"__u_{c}").alias(c)
            if c in tracked_cols
            else F.lit(new_version).alias(c)
            if c == version_col
            else F.lit(True).alias(c)
            if c == current_col
            else F.col(c)
            for c in dim_cols
        ]
    )
    # branch 3: brand-new keys
    inserts = j.where(insert).select(
        *[
            F.col(f"__u_{c}").alias(c)
            if c in u_cols
            else F.lit(new_version).alias(c)
            if c == version_col
            else F.lit(True).alias(c)
            if c == current_col
            else F.lit(None).cast(dim.schema[c].dataType).alias(c)
            for c in dim_cols
        ]
    )
    # closed history rows (is_current already false) pass through outside
    # the join entirely
    history = dim.where(~F.col(current_col))
    return history.unionByName(existing).unionByName(new_versions).unionByName(inserts)


def snapshot_diff(
    v1: DataFrame,
    v2: DataFrame,
    key: str,
    compare_cols: list[tuple[str, str]],
) -> DataFrame:
    """Change-data-capture diff between two snapshots of the same
    table: full outer join on ``key``, classify Insert/Update/Delete,
    drop unchanged rows. ``compare_cols`` maps each tracked source
    column to its output suffix — ``("o_totalprice", "totalprice")``
    emits ``old_totalprice``/``new_totalprice``.

    Laws (pinned in tests/test_properties.py):
    - idempotence: ``snapshot_diff(v, v) == empty`` for any snapshot;
    - partition: every key appears at most once, with change_type 'I'
      iff absent from v1, 'D' iff absent from v2, 'U' otherwise.

    Change detection is null-safe (``~eqNullSafe``): NULL→value and
    value→NULL transitions are real updates. (The driver oracle's SQL
    uses ``<>`` — identical on the null-free TPC-H snapshots it runs
    against.)

    Scale: one shuffle per side on the key, then a row-local CASE — no
    windows, no skew (keys unique per side). At 100 TB both snapshots
    bucket by the key and the diff joins shuffle-free."""
    a = v1.select(
        F.col(key).alias("k1"),
        *[F.col(c).alias(f"old_{out}") for c, out in compare_cols],
    )
    b = v2.select(
        F.col(key).alias("k2"),
        *[F.col(c).alias(f"new_{out}") for c, out in compare_cols],
    )
    j = a.join(b, F.col("k1") == F.col("k2"), "full_outer")
    change = (
        F.when(F.col("k1").isNull(), "I")
        .when(F.col("k2").isNull(), "D")
        .otherwise("U")
    )
    differs: Column = F.lit(False)
    for _, out in compare_cols:
        differs = differs | ~F.col(f"old_{out}").eqNullSafe(F.col(f"new_{out}"))
    out_cols: list[Column] = []
    for _, out in compare_cols:
        out_cols += [F.col(f"old_{out}"), F.col(f"new_{out}")]
    return j.select(
        F.coalesce("k1", "k2").alias(key),
        change.alias("change_type"),
        *out_cols,
    ).where(F.col("k1").isNull() | F.col("k2").isNull() | differs)
