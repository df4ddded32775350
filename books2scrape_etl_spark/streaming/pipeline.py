"""T1 applied to the reference's ACTUAL pipeline: the books star-schema
build running under Structured Streaming with a foreachBatch sink.

The reference reruns extract->transform->load every 10 minutes from
scratch (airflow.py:31,35 schedule). The streaming form watches a
landing directory of raw book rows (what the scraper appends), and each
micro-batch runs the SAME transform code path (plans.books.clean_books
-> build_books_star — zero logic duplicated) and lands the fact
idempotently: every batch writes ``fact/batch_id=N`` with per-partition
overwrite, so a replayed batch (checkpoint recovery re-delivers the
same files under the same batch id) overwrites itself instead of
duplicating rows — the exactly-once foreachBatch idiom.

Scale notes: the landing dir is the real contract (object-store prefix
at 100 TB); ``maxFilesPerTrigger`` bounds batch size; per-batch dims
are batch-local by design (global dims need a MERGE-capable table
format — documented seam, the write becomes a Delta/Iceberg MERGE with
the same plan upstream).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.plans.books import build_books_star, clean_books


def streaming_books_star(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain ``landing_dir`` (parquet files of raw book rows) through
    the books star transform under foreachBatch; returns the landed
    fact rows re-read from the sink (with their batch_id column)."""
    from books2scrape_etl_spark.io import BOOKS_RAW_SCHEMA

    out = out_dir or os.path.join(
        tempfile.gettempdir(), f"books_star_{uuid.uuid4().hex[:8]}"
    )
    fact_dir = os.path.join(out, "fact")
    ckpt = os.path.join(out, "_ckpt")

    raw = (
        spark.readStream.schema(BOOKS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )

    def land(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = clean_books(batch_df)
        dims, fact = build_books_star(cleaned)
        # idempotent: same batch id -> same partition dir -> overwrite
        (
            fact.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(fact_dir)
        )

    from books2scrape_etl_spark.streaming.windows import _few_state_partitions

    with _few_state_partitions(spark):
        q = (
            raw.writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(fact_dir)


def land_one_batch(spark: SparkSession, raw: DataFrame, out: str, batch_id: int) -> None:
    """The foreachBatch body as a callable — exposed so tests can replay
    a batch id directly and assert idempotence without a second stream."""
    cleaned = clean_books(raw)
    _, fact = build_books_star(cleaned)
    (
        fact.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(os.path.join(out, "fact"))
    )
