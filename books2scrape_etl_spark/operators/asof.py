"""General two-table as-of join (SURVEY.md §2.5 J7, general form).

The window formulation in ``query_defs.q_join_asof`` handles the
single-stream case (both sides already in one table). This operator is
the general contract: two arbitrary DataFrames, matched per ``by`` key
on the latest ``on``-value at-or-before (backward) / at-or-after
(forward) each left row — the semantics of ``pd.merge_asof`` and of
kdb+/QuestDB/DuckDB ASOF JOIN.

Scale shape: ``groupBy(by).cogroup`` shuffles each side ONCE on the by
key; every (key) group is then merged in a single Arrow-batched pandas
call (sort + linear merge, O(n log n) in the group, no cross product).
At 100 TB the shuffle carries only the projected columns and partition
count follows spark.sql.shuffle.partitions. Honest limit: each BY-KEY
GROUP must fit one worker's memory (cogroup keys cannot be split by
AQE) — right for the typical as-of shape (many instruments/users,
bounded history each). For a mega-key, either pre-chunk the on-range
(coarse time bucket added to `by`, right side duplicated into each
bucket it borders) or use the single-stream window formulation
(query_defs.q_join_asof). Spark has no native as-of join; this is the
documented idiom (pandas-on-Spark's merge_asof uses the same cogroup
plan underneath).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    *,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    right_prefix: str = "asof_",
) -> DataFrame:
    """As-of join ``left`` to ``right`` per ``by`` key on ordering col ``on``.

    Every non-key right column comes back prefixed with ``right_prefix``
    (including the matched ``on`` value as ``{prefix}{on}``), nullable —
    unmatched left rows survive (left-outer semantics, like merge_asof).

    ``on`` must be a numeric/epoch column on BOTH sides (timestamps
    should be projected to ``unix_micros`` first: keeps the pandas
    boundary TZ-free and the Arrow transfer a plain int64).
    """
    by = list(by)
    left_cols = [f for f in left.schema.fields if f.name not in by and f.name != on]
    right_cols = [f for f in right.schema.fields if f.name not in by and f.name != on]
    out_fields = (
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{right_prefix}{on} {right.schema[on].dataType.simpleString()}"]
        + [f"{right_prefix}{f.name} {f.dataType.simpleString()}" for f in right_cols]
    )
    schema = ", ".join(out_fields)
    left_names = [f.name for f in left.schema.fields]
    right_out = [on] + [f.name for f in right_cols]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame({c: [] for c in left_names + [right_prefix + c for c in right_out]})
        l = l.sort_values(on, kind="mergesort")
        if len(r) == 0:
            out = l.copy()
            for c in right_out:
                out[right_prefix + c] = pd.array([None] * len(out), dtype="object")
            return out
        r = r[by + right_out].rename(columns={c: right_prefix + c for c in right_out})
        # merge_asof needs the on-key under one name in both frames
        r[on] = r[right_prefix + on]
        r = r.sort_values(on, kind="mergesort")
        out = pd.merge_asof(
            l,
            r.drop(columns=by),
            on=on,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )
        return out[left_names + [right_prefix + c for c in right_out]]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(merge, schema)
    )
