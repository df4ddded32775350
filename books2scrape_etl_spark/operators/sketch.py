"""KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
2002; Beyer et al. 2007 "On Synopses for Distinct-Value Estimation") —
the NOTES.md "mergeable-state sketch" item, done without Scala.

Spark ships HLL++ (``approx_count_distinct``) but its sketch internals
are engine-private, so the qname can only ever be rows-only. KMV is the
sketch whose STATE is plain data: the k smallest distinct hash values
of the key. That buys two things HLL can't give here:

- **a hard oracle** — any engine that agrees on the hash function
  derives the identical k-minimum set, so the driver value-matches the
  sketch itself AND the estimate (portable md5-prefix hash, the same
  rule as :func:`operators.sampling.hash_bucket`);
- **transparent mergeability** — merge(A, B) = the k smallest of
  A ∪ B: associative, commutative, idempotent. That is exactly the
  shape of a partial aggregate, which is why KMV scales: every
  partition reduces its rows to ≤ k longs before anything shuffles.

Estimator: with hashes uniform on [0, 2^32) and h_(k) the k-th
smallest, E[distinct] ≈ (k-1) · 2^32 / h_(k); below k distincts the
sketch is exact (it holds every hash).

Scale notes (100 TB posture): the implementation is
distinct → per-group k-smallest (row_number window) → one-row-per-group
aggregate. The distinct is a partial (map-side) aggregation, so the
shuffle carries distinct (group, hash) pairs only — never rows; the
window then ranks per group. At extreme cardinalities the production
form replaces the window with per-partition top-k partials merged
associatively (the sketch property above); the declarative form here is
chosen because it is oracle-replayable line for line. The estimate is
within ~1/sqrt(k-1) relative error (≈6% at k=256) with the k-th hash
value exposed so downstream can re-derive or merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.util import to_col

# 2^32 — the hash space of the md5-prefix rule (8 hex digits).
_HASH_SPACE = 4294967296.0


def portable_hash32(key: Column | str) -> Column:
    """First 8 hex digits of md5(key) as bigint in [0, 2^32) — shared
    engine-portable rule (DuckDB twin:
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(to_col(key).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def kmv_distinct(
    df: DataFrame,
    key: Column | str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV distinct-count estimate for ``key``.

    Returns (group..., k_used, kth_hash, est_dv, exact_dv): the sketch
    size actually filled, the k-th smallest hash (the sketch boundary —
    enough to merge or re-derive), the KMV estimate, and the exact
    distinct count for calibration (the exact count shares the one
    distinct pass, so it is one extra aggregate, not an extra scan).
    """
    groups = group_cols or []
    hashes = (
        df.select(*groups, portable_hash32(key).alias("hv")).distinct().persist()
    )
    try:
        exact = hashes.groupBy(*groups).agg(F.count(F.lit(1)).alias("exact_dv"))
        if groups:
            # per-group k-smallest via a window; parallelism = group count
            # (fine for low-cardinality groups, which is what grouped
            # sketching is for — per-key cardinality wants the KMV merge
            # form instead).
            w = Window.partitionBy(*groups).orderBy("hv")
            topk = hashes.withColumn("rn", F.row_number().over(w)).where(
                F.col("rn") <= k
            )
        else:
            # orderBy+limit plans as TakeOrderedAndProject: each partition
            # keeps its own k smallest before the single merge — never a
            # one-task global sort (which Window.partitionBy(lit) would be).
            topk = hashes.orderBy("hv").limit(k)
        sk = topk.groupBy(*groups).agg(
            F.count(F.lit(1)).alias("k_used"), F.max("hv").alias("kth_hash")
        )
        est = F.when(
            F.col("k_used") < k, F.col("k_used").cast("double")
        ).otherwise(F.lit((k - 1) * _HASH_SPACE) / F.col("kth_hash").cast("double"))
        joined = sk.join(exact, groups) if groups else sk.crossJoin(exact)
        out = joined.select(
            *groups, "k_used", "kth_hash", est.alias("est_dv"), "exact_dv"
        )
        # Materialize while the shared distinct table is still cached.
        return out.localCheckpoint(eager=True)
    finally:
        hashes.unpersist()
