"""IO layer: explicit schemas + readers/writers.

The reference re-infers its schema on every CSV read
(transformation_pipeline.py:40 — ``pd.read_csv`` with no dtype=) and uses CSV
as the only on-disk format (SURVEY.md §1.1). At scale both are wrong:
inference is an extra full pass and nondeterministic; CSV is row-oriented,
schema-less and unsplittable when compressed. The engine declares every
schema as an explicit StructType and defaults to Parquet (columnar,
schema-carrying, predicate-pushdown + column-pruning capable); CSV remains
an edge format for parity with the reference (extract_pipeline.py:89).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_log = logging.getLogger(__name__)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# ---------------------------------------------------------------------------
# Testdata schemas (TESTDATA.md / FIXTURES.md §B) — declared, never inferred.
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES = tuple(TESTDATA_SCHEMAS)

# books_raw: mirrors the reference scraper output (extract_pipeline.py:36-51),
# exact column names the reference writes to books.csv, dirty types as scraped.
BOOKS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("Title", T.StringType()),
        T.StructField("Description", T.StringType()),  # nullable, mojibake-prone
        T.StructField("Category", T.StringType()),
        T.StructField("Image_link", T.StringType()),
        T.StructField("Is_in_Stock", T.BooleanType()),
        T.StructField("No_of_books_in_Stock", T.IntegerType()),
        T.StructField("Rating", T.IntegerType()),
        T.StructField("UPC", T.StringType()),
        T.StructField("Product Type", T.StringType()),
        T.StructField("Price (excl. tax)", T.StringType()),  # dirty currency text
        T.StructField("Price (incl. tax)", T.StringType()),
        T.StructField("Tax", T.StringType()),
        T.StructField("Number of reviews", T.StringType()),
    ]
)


def read_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one testdata parquet table (S7). Parquet gives the vectorized
    reader, column pruning and predicate pushdown for free — the scan the
    reference never had (it re-reads a full CSV, transformation_pipeline.py:40).

    ``events.ts`` has shipped in two physical vintages: TIMESTAMP(NANOS)
    (which Spark only reads as raw BIGINT via the legacy ``nanosAsLong``
    conf) and TIMESTAMP(MICROS) without isAdjustedToUTC (which Spark reads
    as TIMESTAMP_NTZ). The contract downstream is a plain TimestampType
    column whose UTC epoch equals the stored wall-clock value — exactly
    what micros-precision engines (e.g. DuckDB) yield on the same file.
    Branch on the dtype the scan actually produced, never on an assumed
    vintage: schema drift in the input must not break the reader."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _read_events_any_vintage(spark, path)
    return spark.read.parquet(path)


# Epoch-unit magnitude bands: 2000-2100 wall clocks land at ~1e9 (s),
# ~1e12 (ms), ~1e15 (us), ~1e18 (ns) — three orders of magnitude apart,
# so one sample value identifies the unit unambiguously.
_EPOCH_UNIT_BANDS: tuple[tuple[int, str], ...] = (
    (10**17, "ns"),
    (10**14, "us"),
    (10**11, "ms"),
    (0, "s"),
)


def infer_epoch_unit(sample: int) -> str:
    """'ns' | 'us' | 'ms' | 's' from one epoch value's magnitude."""
    v = abs(int(sample))
    return next(unit for floor, unit in _EPOCH_UNIT_BANDS if v >= floor)


# epoch-unit inference memo: (path, file-mtime) -> unit. The sample job
# is one LocalLimit collect; without the memo it re-runs on EVERY plan
# construction over the bigint vintage (ADVICE r4). mtime in the key
# invalidates the entry when the driver regenerates the testdata.
_EPOCH_UNIT_CACHE: dict[tuple[str, float], str] = {}


def _path_mtime(path: str) -> float:
    """Latest mtime under ``path`` (parquet 'files' are often directories
    of part files; the dir mtime alone misses in-place part rewrites)."""
    try:
        if os.path.isdir(path):
            times = [os.path.getmtime(path)]
            for entry in os.scandir(path):
                times.append(entry.stat().st_mtime)
            return max(times)
        return os.path.getmtime(path)
    except OSError:
        return -1.0  # unstat-able (e.g. remote FS) -> cache per path only


def _epoch_long_to_ts(df, path: str = ""):
    """TimestampType from a raw BIGINT epoch ``ts`` column, inferring the
    unit from sampled values instead of assuming a vintage (assuming
    nanos is exactly what broke when the physical type drifted; a raw
    int64 epoch column could just as well arrive as micros or millis).
    The sample is a LocalLimit job — first non-empty partition only,
    even on a 100 TB table; it takes the MEDIAN magnitude of up to 16
    non-null, non-zero values so neither a 0/epoch-start sentinel nor a
    few corrupt oversized values can misclassify the whole column. The
    result is memoized per (path, mtime) so the job runs once per file
    vintage, not once per plan construction, and the chosen unit is
    logged so a misclassification is visible. Integer arithmetic
    throughout: float division of epoch-nanos longs exceeds double's
    53-bit mantissa and rounds the last microsecond."""
    from pyspark.sql import functions as F

    cache_key = (path, _path_mtime(path)) if path else None
    unit = _EPOCH_UNIT_CACHE.get(cache_key) if cache_key else None
    if unit is None:
        rows = (
            df.where(F.col("ts").isNotNull() & (F.col("ts") != 0))
            .select("ts")
            .limit(16)
            .collect()
        )
        if rows:
            mags = sorted(abs(r[0]) for r in rows)
            unit = infer_epoch_unit(mags[len(mags) // 2])
        else:
            unit = "ns"
        _log.info("epoch unit for %s: %s (from %d samples)", path or "<df>", unit, len(rows))
        if cache_key:
            _EPOCH_UNIT_CACHE[cache_key] = unit
    expr = {
        "ns": "ts DIV 1000",
        "us": "ts",
        "ms": "ts * 1000",
        "s": "ts * 1000000",
    }[unit]
    return F.timestamp_micros(F.expr(expr))


def _pin_utc(spark: SparkSession) -> None:
    """Pin the session TZ to UTC for NTZ-reinterpretation reads, loudly.

    The cast that follows resolves against the session TZ at analysis
    time, so a save-and-restore would silently break the lazy plan; the
    session must genuinely stay UTC. session.py pins UTC at creation, so
    in-repo this never fires a warning — but a caller embedding the
    readers in a non-UTC session deserves to hear that later queries'
    timestamp semantics just changed (ADVICE r4)."""
    prev = spark.conf.get("spark.sql.session.timeZone", None)
    if prev not in (None, "UTC", "Etc/UTC", "GMT"):
        import warnings

        warnings.warn(
            f"read_table(events): session timeZone changed {prev!r} -> 'UTC' "
            "to reinterpret a TIMESTAMP_NTZ vintage; this affects the whole "
            "session",
            stacklevel=3,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def read_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: read_table(spark, name, sf_dir) for name in TABLES}


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV scan with an explicit schema (S6) — replaces the reference's
    inferring ``pd.read_csv`` (transformation_pipeline.py:40). No inference
    pass, deterministic types at any scale."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink (S5) — parity with the reference's ``df.to_csv``
    (extract_pipeline.py:89; transformation_pipeline.py:66-117).
    ``single_file`` coalesces to 1 partition for small dims only; the
    default keeps one file per partition (the scale path)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-Lines scan with an explicit schema — the interchange format
    of LLM training corpora (one document object per line). Explicit
    schema skips Spark's sampling inference pass (a full extra scan at
    100 TB) and keeps types deterministic; JSONL splits by line, so a
    single large file still parallelizes across executors."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-Lines sink (one object per row, newline-delimited). The
    default writes one file per partition — the scale path; pair with
    ``repartition`` upstream to control shard count/size."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — Spark's second built-in columnar format (vectorized
    reader, predicate pushdown and column pruning like parquet). Kept
    for interchange with Hive/Trino-era warehouses."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (zlib-striped columnar, one file per partition)."""
    df.write.mode("overwrite").orc(path)


def compact_small_files(
    spark: SparkSession, src_path: str, dst_path: str, target_files: int
) -> DataFrame:
    """Small-files compaction — the lakehouse maintenance op every
    streaming/batch landing zone eventually needs: N tiny parquet files
    (each its own scan task, footer fetch and open cost) rewritten as
    ``target_files`` right-sized ones. One read + one repartition + one
    write; row content is untouched, which is exactly what the caller
    should verify (the compact_files qname's oracle does). At scale the
    target count comes from bytes/target-size, not a constant — the
    mechanism is identical."""
    df = spark.read.parquet(src_path)
    df.repartition(target_files).write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)


def read_events_landing(spark: SparkSession, root: str) -> DataFrame:
    """Read an events landing zone whose batches may span PHYSICAL ts
    vintages (TIMESTAMP(NANOS) rounds <=2, TIMESTAMP(MICROS)-NTZ rounds
    >=3, raw int64 epochs as a future drift). ``mergeSchema`` cannot
    reconcile physical drift — the footer merge sees bigint vs
    timestamp_ntz and fails — so each batch directory goes through the
    vintage-adaptive events reader (:func:`read_table`'s normalization)
    FIRST and the union happens on the normalized TimestampType schema.
    This is the round-3 lesson made structural: a driver testdata
    re-encode lands as just another vintage in one batch, and the union
    keeps reading. At scale this is a per-batch footer decision — no
    data rewrite, no extra shuffle (unionByName is a narrow op)."""
    # Skip writer metadata/staging entries (_temporary, .spark-staging,
    # _delta_log, _SUCCESS, .crc) — the same leading '_'/'.' convention
    # Spark's own file index uses. Reading those as batches would fail
    # the scan or duplicate data in a real landing zone (ADVICE r6).
    batches = sorted(
        e.path for e in os.scandir(root)
        if not e.name.startswith(("_", "."))
        and (e.is_dir() or e.name.endswith(".parquet"))
    )
    if not batches:
        raise ValueError(f"no landed batches under {root}")
    frames = [_read_events_any_vintage(spark, b) for b in batches]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _read_events_any_vintage(spark: SparkSession, path: str) -> DataFrame:
    """The vintage-adaptive events scan shared by ``read_table`` and
    :func:`read_events_landing`. Branch on the dtype the scan actually
    produced, never on an assumed vintage."""
    from pyspark.sql import functions as F

    # Harmless for micros files (the conf only affects NANOS columns);
    # required for nanos files, which otherwise fail the scan outright.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", _epoch_long_to_ts(df, path))
    if ts_type == "timestamp_ntz":
        # micros-NTZ vintage: reinterpret the wall-clock value as UTC so
        # the epoch matches the nanos-vintage path bit for bit. The cast
        # resolves against the session TZ at analysis time — pin it here
        # rather than trusting the caller to have done so.
        _pin_utc(spark)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df  # already a session-TZ timestamp — pass through


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink — the engine's default interchange format. Optional
    ``partition_by`` enables static + dynamic partition pruning downstream
    (SURVEY.md §4.2 'partition pruning')."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
