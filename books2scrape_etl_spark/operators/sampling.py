"""Deterministic corpus sampling — train/val/test splits and dataset
mixture weighting over the ``documents`` table (SURVEY.md §2.11
training-pipeline extension; the reference has no sampling stage —
``extract_pipeline.py`` re-scrapes everything every run).

Training-data pipelines need REPRODUCIBLE sampling: the same document
must land in the same split on every run, at any cluster size, with no
RNG state and no coordination. Hash-bucket assignment delivers that:

    bucket(key) = int(md5(key)[:8 hex digits]) mod n_buckets

is a pure per-row projection — no shuffle, no RNG seed to ship, no
sort — and any engine can re-derive it (the DuckDB oracle computes the
same buckets independently, so the split is hard-verifiable).

Scale notes (100 TB posture):

- Everything here is a narrow projection + filter: zero shuffles, fully
  pushed into the scan stage, embarrassingly parallel. ``split_assign``
  on 100 TB is exactly as parallel as the scan itself.
- md5 (not Spark's faster ``xxhash64``) is deliberate: the bucket
  function is part of the DATA CONTRACT — downstream consumers and
  other engines must agree on which doc is in which split forever.
  md5 of a short key is a few ns JVM-side (commons-codec, inside
  whole-stage codegen via the builtin); the portability is worth it.
- Mixture oversampling (weight > 1) materializes copies via
  ``explode(sequence(...))`` — row fan-out happens AFTER the filter
  and AFTER column pruning, so only surviving rows are duplicated.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.util import to_col


def hash_bucket(key: Column | str, n_buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 hex digits of
    md5(key) as an int, mod n_buckets. Engine-portable (DuckDB twin:
    ``CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT) % n``)."""
    hex8 = F.substring(F.md5(to_col(key).cast("string")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("bigint") % n_buckets).alias("bucket")


def split_assign(
    df: DataFrame,
    key: Column | str,
    fractions: Mapping[str, float] | None = None,
    n_buckets: int = 1000,
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split by
    cumulative bucket thresholds. Default 90/5/5 train/val/test.

    Assignment is a function of the KEY alone: stable across runs,
    re-partitions, and engines; growing the corpus never moves an
    existing document between splits (the property RNG sampling lacks).
    """
    fractions = dict(fractions or {"train": 0.90, "val": 0.05, "test": 0.05})
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(key, n_buckets)
    expr: Column | None = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * n_buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("bucket", bucket).withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key: Column | str,
    n_per_stratum: int,
) -> DataFrame:
    """Deterministic quota sample: the ``n_per_stratum`` rows of each
    stratum that come first in md5-hash order (ties broken by key).

    Hash order is a reproducible stand-in for random order — the same
    rows are chosen every run, on any cluster, by any engine — which is
    what corpus ablations need (an RNG sample is unrepeatable and a
    "first N in storage order" sample is biased by ingest order).

    Scale: one hash-partitioned window per stratum; rows never carry
    payload into the shuffle if callers select slim columns first. For
    very hot strata the rank is still per-stratum sequential — with
    millions of rows per stratum, switch to the threshold form (keep
    rows with bucket < quota/total estimate) which is shuffle-free.
    """
    from pyspark.sql import Window

    hv = hash_bucket(key, 1 << 32).alias("hv")
    w = Window.partitionBy(*strata_cols).orderBy("hv", key)
    return (
        df.withColumn("hv", hv)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_per_stratum)
        .drop("hv")
    )


def stratified_sample_threshold(
    df: DataFrame,
    strata_cols: list[str],
    key: Column | str,
    n_per_stratum: int,
    resolution: int = 1 << 32,
) -> DataFrame:
    """The scale form of :func:`stratified_sample` for ultra-hot strata:
    instead of a per-stratum sequential rank (a window whose hot-stratum
    task sorts millions of rows), keep rows whose portable hash falls
    under a per-stratum threshold::

        keep iff hash_bucket(key, R) < R * min(1, quota / stratum_count)

    One small aggregation (stratum cardinality rows) broadcast back, then
    a map-side filter — no window, no per-stratum sort, as parallel as
    the scan. The trade: the quota is EXPECTED, not exact (binomial
    around ``n_per_stratum``); the chosen subset is still fully
    deterministic and engine-portable, so an oracle re-derives it
    row-for-row. Adds ``_frac`` (the applied keep fraction) for
    accounting.

    NULL strata are real strata: the count join is null-safe
    (``IS NOT DISTINCT FROM``), so rows with a NULL stratum column get
    the NULL group's quota instead of being silently dropped — same
    grouping rule as the groupBy that computes the counts."""
    counts = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("_n"))
    frac = F.least(F.lit(1.0), F.lit(float(n_per_stratum)) / F.col("_n"))
    hv = hash_bucket(key, resolution)
    cond = None
    for c in strata_cols:
        eq = df[c].eqNullSafe(counts[c])
        cond = eq if cond is None else (cond & eq)
    joined = df.join(F.broadcast(counts), cond)
    for c in strata_cols:
        joined = joined.drop(counts[c])
    return (
        joined.withColumn("_frac", frac)
        .where(hv < F.col("_frac") * F.lit(float(resolution)))
        .drop("_n")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key: Column | str,
    resolution: int = 1 << 32,
) -> DataFrame:
    """Keep each row independently with probability equal to its
    ``weight`` (clamped to [0, 1]), deterministically: keep iff

        hash_bucket(key, resolution) < weight * resolution

    — the per-row Bernoulli draw every quality-weighted corpus-sampling
    recipe needs ("keep high-quality documents with probability ~ their
    quality score"), but with the hash standing in for the RNG so the
    SAME documents survive on every run, at any cluster size, in any
    engine. Adds the clamped weight as column ``w`` (the accounting
    column mixture/ablation bookkeeping wants); a pure projection +
    filter — zero shuffles, fully scan-pushed, as parallel as the scan.
    """
    hv = hash_bucket(key, resolution)
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.withColumn("w", w).where(hv < F.col("w") * F.lit(float(resolution)))


def mixture_sample(
    df: DataFrame,
    source: Column | str,
    key: Column | str,
    weights: Mapping[str, float],
    default_weight: float = 1.0,
    n_buckets: int = 1000,
) -> DataFrame:
    """Deterministic dataset-mixture weighting: keep/duplicate rows per
    source so that source s contributes ~weight(s) epochs of itself.

    - weight < 1 downsamples: keep iff bucket < weight * n_buckets.
    - weight > 1 oversamples: ``ceil(weight) - 1`` full copies plus a
      fractional epoch drawn by the same bucket rule, materialized with
      one ``explode(sequence(1, n_copies))`` (an ``epoch`` column tags
      the copies so downstream shuffles can still dedup per epoch).

    The fractional epoch reuses the per-key bucket, so it is the SAME
    deterministic subset every run — how production mixtures pin their
    partial epochs (a fresh RNG draw per run would defeat caching and
    make ablations irreproducible).
    """
    src = to_col(source)
    w: Column = F.lit(float(default_weight))
    for name, weight in sorted(weights.items()):
        w = F.when(src == name, float(weight)).otherwise(w)
    bucket = hash_bucket(key, n_buckets)
    n_full = F.floor(w).cast("int")
    frac = w - F.floor(w)
    takes_frac = bucket < (frac * n_buckets).cast("bigint")
    n_copies = n_full + takes_frac.cast("int")
    return (
        df.withColumn("bucket", bucket)
        .withColumn("n_copies", n_copies)
        .where(F.col("n_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("n_copies"))))
        .drop("n_copies")
    )
