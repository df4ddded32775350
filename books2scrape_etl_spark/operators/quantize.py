"""Embedding scalar quantization (int8-style codes) — the storage-side
half of the similarity stack (Jegou et al. 2011 §II.A uniform scalar
quantizer; the standard "SQ8" layout every vector store ships).

Per-vector min/max scalar quantization: code_i = floor((x_i - mn) *
255 / (mx - mn) + 0.5), an integer in [0, 255]; dequantization is
x'_i = mn + code_i * rng / 255. At 100 TB this is a pure map-side
projection (no shuffle, no state): 64 floats (256 B) become 64 bytes
of codes + two doubles, a 4x scan-volume cut for every downstream
ANN/near-dup pass that tolerates the ~rng/510 per-element error.

Everything is expressed in Catalyst higher-order functions over
doubles with a pinned operation order, so the DuckDB oracle replays
the arithmetic bit-for-bit (same IEEE ops in the same order — the
convention established by operators/similarity.py's dot/cosine).
Reconstruction metrics (max abs error, cosine(orig, dequant)) ride
along as columns: the quantizer's quality claim is driver-checkable
data, not a docstring assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from books2scrape_etl_spark.operators.similarity import cosine


def quantize_scalar(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector uniform scalar quantization to 8-bit codes.

    Returns (vec_id, qmin, qrange, codes, max_abs_err, cos_orig):
    ``codes`` is array<int> in [0, 255]; ``max_abs_err`` the worst
    per-element |x - dequant(x)|; ``cos_orig`` the cosine between the
    original and dequantized vector. Constant vectors (rng = 0)
    quantize to all-zero codes and reconstruct exactly.
    """
    v = F.col(vec_col)
    base = emb.select(
        "vec_id",
        v.alias("v"),
        F.array_min(v).cast("double").alias("mn"),
        (F.array_max(v).cast("double") - F.array_min(v).cast("double")).alias("rng"),
    )
    mn, rng = F.col("mn"), F.col("rng")
    codes = F.when(
        rng == 0, F.transform(F.col("v"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("v"),
            lambda x: F.floor((x.cast("double") - mn) * F.lit(255.0) / rng + F.lit(0.5)).cast(
                "int"
            ),
        )
    )
    q = base.select("vec_id", "v", "mn", "rng", codes.alias("codes"))
    dequant = F.transform(
        F.col("codes"), lambda c: F.col("mn") + c.cast("double") * F.col("rng") / F.lit(255.0)
    )
    staged = q.select("vec_id", "v", "mn", "rng", "codes", dequant.alias("dq"))
    err = F.array_max(
        F.zip_with(F.col("v"), F.col("dq"), lambda x, d: F.abs(x.cast("double") - d))
    )
    return staged.select(
        "vec_id",
        F.round("mn", 6).alias("qmin"),
        F.round("rng", 6).alias("qrange"),
        F.concat_ws(",", F.col("codes").cast("array<string>")).alias("codes_str"),
        F.round(err, 6).alias("max_abs_err"),
        F.round(cosine(F.col("v"), F.col("dq")), 6).alias("cos_orig"),
    )
