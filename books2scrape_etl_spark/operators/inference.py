"""Batch model inference over documents — the embedding-GENERATION
shape (the similarity/dedup operators consume an ``embeddings`` table;
this is the operator that produces one at scale).

The model here is a deterministic stand-in with the exact plumbing a
real encoder needs — the same contract as the multimodal codec stubs:

- **weights are broadcast once per executor** (a seeded random
  projection matrix stands in for model parameters; a real encoder
  swaps in its weight blob or a model-server handle),
- **inference runs in ``mapInPandas``**: map-side only, no shuffle, no
  grouping — each Arrow batch is featurized (hashing-trick token
  counts) and pushed through a vectorized projection, then
  L2-normalized,
- **batch-size invariance is a tested property**: outputs are
  BIT-identical under any partitioning or Arrow batch split, which is
  what makes the op restartable and cluster-size-independent. This is
  deliberate and non-trivial: a BLAS ``feats @ w`` varies in the last
  float32 ulp with the batch's row count (gemm picks different
  accumulation blockings per shape — measured here), so the forward
  pass contracts per output dim with numpy's pairwise sum, whose
  reduction order depends only on the vocab axis length. A real
  encoder won't have this property (GPU kernels are shape-sensitive);
  pin the Arrow batch size if bitwise reproducibility matters there.

Why a fake model: no ML runtime ships in this container. The token
count loop is per-token Python (acceptable: it stands where a real
encoder's tokenizer would run); the matmul + normalization — the part
that dominates with a real model — is vectorized numpy over the whole
batch. Swapping in a real encoder is a one-function change to
``_featurize``/the matmul, exactly like the multimodal decode stubs
(operators/multimodal.py).

Scale notes (100 TB posture): embedding generation is embarrassingly
parallel and compute-bound — the only cluster concerns are (1) weight
distribution, solved by the broadcast (shipped once per executor, not
per task), (2) Arrow batch sizing via
``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound peak memory
(batch_rows × vocab_hash floats here; batch × sequence × hidden for a
real model), and (3) writing the output column as
``array<float>``-equivalent without collecting — the operator returns
a DataFrame that flows straight to a partitioned parquet sink.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _projection(vocab_hash: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((vocab_hash, dim)) / np.sqrt(dim)).astype("float32")


def _forward(feats: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Projection with a batch-shape-independent accumulation order:
    for each output dim, an elementwise product over the vocab axis
    reduced by numpy's pairwise sum (order a function of vocab_hash
    only — never of how many rows share the batch)."""
    out = np.empty((feats.shape[0], w.shape[1]), dtype="float32")
    for j in range(w.shape[1]):
        out[:, j] = (feats * w[:, j][None, :]).sum(axis=1)
    return out


def _featurize(texts, vocab_hash: int) -> np.ndarray:
    """Hashing-trick token counts (crc32 mod vocab_hash) — the stand-in
    tokenizer. Deterministic across runs, processes, and engines."""
    out = np.zeros((len(texts), vocab_hash), dtype="float32")
    for i, text in enumerate(texts):
        for tok in (text or "").split():
            out[i, zlib.crc32(tok.encode("utf-8")) % vocab_hash] += 1.0
    return out


def embed_generate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    vocab_hash: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """(id, embedding array<double>) — L2-normalized document embeddings
    from the broadcast projection model. Zero-vector documents (no
    tokens) embed as the zero vector rather than NaN."""
    sc = docs.sparkSession.sparkContext
    weights = sc.broadcast(_projection(vocab_hash, dim, seed))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = weights.value
        for pdf in batches:
            feats = _featurize(pdf[text_col].tolist(), w.shape[0])
            emb = _forward(feats, w)
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            emb = (emb / norms).astype("float64")
            yield pd.DataFrame({id_col: pdf[id_col].values, "embedding": list(emb)})

    slim = docs.select(id_col, text_col)
    return slim.mapInPandas(gen, schema=f"{id_col} long, embedding array<double>")
