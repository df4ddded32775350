"""Multimodal-column plumbing (SURVEY.md §2.11 L5).

The reference stores only an image URL string (extract_pipeline.py:13,40).
A training-data pipeline needs the real thing: opaque ``binary`` payload
columns with typed metadata, plus decode / feature-extract / resize /
frame-sample stages as Arrow-batched ``mapInPandas`` operators.

The image/audio codec libraries are NOT in this container, so the codec
kernels are stubbed (clearly marked), but everything Spark-side is real
and tested: schemas, batch iteration shape, UDF signatures,
partitioning. Swapping a stub for ``PIL.Image.open`` is a one-function
change that alters no plan shape.

Scale notes: binary payloads make rows wide — the operators keep
metadata-only projections separate from payload-carrying ones so
Catalyst can prune the heavy column; `maxRecordsPerBatch` bounds Arrow
batch memory; payload columns should be stored in their own parquet
column chunk (automatic) and read only by stages that decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("uri", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_META_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, channels int, format string"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload so
    the multimodal plumbing is exercisable on the driver testdata
    (binary column, real byte lengths)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("uri"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    ).withColumn("n_bytes", F.octet_length("payload"))


def read_binary_dir(spark, path: str) -> DataFrame:
    """L5 source — Spark's built-in binaryFile reader: one row per file
    with (path, modificationTime, length, content<binary>)."""
    return spark.read.format("binaryFile").load(path)


def _stub_decode_image(payload: bytes) -> tuple[int, int, int, str]:
    """STUB — deterministic fake decode. Real impl: PIL/libvips (not in
    this container). Derives plausible dimensions from a payload hash so
    downstream logic is testable and reproducible."""
    h = hashlib.md5(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    return width, height, 3, "png"


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Decode stage: payload -> (width, height, channels, format).

    Arrow-batched ``mapInPandas``; each batch decodes vectorized-ish in
    one Python crossing. Column pruning keeps ``payload`` out of every
    stage that doesn't call this."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["payload"].map(_stub_decode_image)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "channels": meta.map(lambda m: m[2]),
                    "format": meta.map(lambda m: m[3]),
                }
            )

    return media.mapInPandas(batches, IMAGE_META_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage. STUB kernel: returns a deterministic truncated
    payload standing in for re-encoded bytes; real impl swaps the lambda
    for an actual resampler. Plan shape (projection + mapInPandas) is
    the real one."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fake = pdf["payload"].map(
                lambda b: (b or b"")[: max(16, width * height // 1024)]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "uri": pdf["uri"],
                    "media_type": pdf["media_type"],
                    "payload": fake,
                    "n_bytes": fake.map(len),
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Frame-sampling stage (video -> frames, 1 row -> N rows).

    STUB kernel slices the payload; a real decoder would emit actual
    frames. The fan-out shape (mapInPandas yielding more rows than it
    consumed) is the real contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = pdf["payload"].map(lambda b: b or b"")
            lens = payloads.map(len).to_numpy(dtype="int64")
            # frames per row, then the whole fan-out as numpy repeats —
            # no per-row Python loop; only the per-frame byte slice (the
            # stand-in for a real per-frame decode) touches objects
            n = np.minimum(max_frames, np.maximum(1, lens // max(every_n, 1)))
            idx = (
                np.concatenate([np.arange(k) for k in n])
                if len(n)
                else np.array([], dtype="int64")
            )
            rep_payloads = np.repeat(payloads.to_numpy(dtype=object), n)
            frames = [
                p[i * every_n : (i + 1) * every_n] for p, i in zip(rep_payloads, idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), n),
                    "frame_idx": idx.astype("int32"),
                    "frame_bytes": frames,
                }
            )

    return media.mapInPandas(batches, FRAME_SAMPLE_SCHEMA)
