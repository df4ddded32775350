"""Small shared helpers for the expression library."""

from __future__ import annotations

import threading

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# spark.sql.shuffle.partitions is SESSION-global: two guards
# overlapping from different threads would run sibling plans at the
# narrowed width and restore each other's stale values. Serialize all
# guarded iteration loops (RLock so a same-thread nested guard still
# composes LIFO-correctly instead of deadlocking).
_SHUFFLE_GUARD_LOCK = threading.RLock()


class sized_shuffle_partitions:
    """Temporarily size ``spark.sql.shuffle.partitions`` to the data
    while an EAGER iteration loop runs (the streaming module's
    _few_state_partitions pattern, justified the same way): callers
    run every round inside the guard and return only
    localCheckpoint-materialized frames, so nothing lazy escapes with
    the temporary value.

    Why: a vanilla session defaults to 200 shuffle partitions, and the
    iterative localCheckpoint pattern defeats AQE's post-shuffle
    coalescing (each round is its own short job over freshly
    checkpointed blocks). A few-thousand-row graph then pays 200 tasks
    x 2-3 stages x O(rounds) of pure scheduling overhead — measured
    1.7x on the CC differential qname. Sizing to ~100k rows/partition
    (floor 8, ceiling the session's own setting, so cluster-sized
    configurations are never widened) keeps small inputs fast and
    1B-edge graphs on the caller's configured width."""

    def __init__(self, spark: SparkSession, n_rows: int) -> None:
        self.spark = spark
        cur = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        self.n = max(8, min(cur, n_rows // 100_000 + 1))

    def __enter__(self) -> None:
        _SHUFFLE_GUARD_LOCK.acquire()
        # If conf access raises after the acquire (stopped session ->
        # py4j error), Python never runs __exit__ — release before
        # re-raising or every future guarded section deadlocks.
        try:
            self.prev = self.spark.conf.get("spark.sql.shuffle.partitions", None)
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        except BaseException:
            _SHUFFLE_GUARD_LOCK.release()
            raise

    def __exit__(self, *exc) -> None:
        try:
            if self.prev is None:
                self.spark.conf.unset("spark.sql.shuffle.partitions")
            else:
                self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        finally:
            _SHUFFLE_GUARD_LOCK.release()


def to_col(col: Column | str) -> Column:
    """Resolve a name-or-Column, backtick-quoting names that contain a
    dot (``F.col("Price (excl. tax)")`` otherwise parses the dot as a
    struct-field access — the reference's column names include dots)."""
    if isinstance(col, Column):
        return col
    if "." in col and not col.startswith("`"):
        return F.col(f"`{col}`")
    return F.col(col)
