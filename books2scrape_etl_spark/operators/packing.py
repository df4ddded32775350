"""Sequence packing — group documents into context-window-sized packs
(SURVEY.md §2.11 training-pipeline extension; no reference analogue —
the reference emits one CSV row per book).

LLM pre-training concatenates documents into fixed-size token windows;
the packing step decides which documents share a window. Two policies:

- ``pack_next_fit``: documents in deterministic (id) order; a running
  accumulator opens a new pack when the next document would overflow.
  Order-preserving and streaming-friendly (one sequential scan), and
  exactly reproducible by any engine — the DuckDB oracle re-derives it
  with a recursive CTE, giving packing a HARD differential check.
- ``pack_first_fit_decreasing``: classic FFD bin packing (sort by size
  desc, place into the first open pack that fits) — better fill ratios
  (FFD uses ≤ 11/9·OPT + 6/9 bins) at the cost of reordering.

Scale notes (100 TB posture):

- Packing is inherently sequential WITHIN a pack stream, so the unit of
  parallelism is the group: partition the corpus into independent pack
  streams (here: language; at scale: lang × hash-shard, e.g.
  ``pmod(hash(doc_id), n_shards)`` for ~executor-count shards) and pack
  each group independently inside one ``applyInPandas`` call. That is
  how production packers shard: no global order exists across shards,
  none is needed — each shard emits self-contained windows.
- The per-group kernel walks a numpy array once in plain Python. That
  is a deliberate choice, not an oversight: the recurrence (accumulator
  resets on overflow) has no closed vectorized form, groups are bounded
  by the sharding above, and the loop touches two scalars per row. The
  Arrow batch transfer around it stays vectorized.
- Only (id, size) columns enter the shuffle — never document text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _pack_schema(df: DataFrame, group_col: str, id_col: str, size_col: str) -> StructType:
    fields = [
        df.schema[group_col],
        df.schema[id_col],
        df.schema[size_col],
        StructField("pack_id", LongType()),
    ]
    return StructType(fields)


def _next_fit_kernel(sizes: np.ndarray, max_size: int) -> np.ndarray:
    """Sequential next-fit: pack_id per element, 1-based."""
    packs = np.empty(len(sizes), dtype=np.int64)
    acc = 0
    pack = 0
    for i, s in enumerate(sizes):
        s = int(s)
        if pack == 0 or acc + s > max_size:
            pack += 1
            acc = s
        else:
            acc += s
        packs[i] = pack
    return packs


def _ffd_kernel(sizes: np.ndarray, max_size: int) -> np.ndarray:
    """First-fit-decreasing over a size-desc order; returns pack ids
    aligned to the INPUT order. Oversize elements get singleton packs."""
    order = np.lexsort((np.arange(len(sizes)), -sizes))  # size desc, index asc
    packs = np.empty(len(sizes), dtype=np.int64)
    remaining: list[int] = []  # remaining capacity per open pack
    for idx in order:
        s = int(sizes[idx])
        placed = -1
        for p, cap in enumerate(remaining):
            if s <= cap:
                placed = p
                break
        if placed < 0:
            remaining.append(max_size - s)
            placed = len(remaining) - 1
        else:
            remaining[placed] -= s
        packs[idx] = placed + 1
    return packs


def _pack_grouped(
    df: DataFrame,
    group_col: str,
    id_col: str,
    size_col: str,
    max_size: int,
    kernel,
) -> DataFrame:
    schema = _pack_schema(df, group_col, id_col, size_col)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        pdf["pack_id"] = kernel(pdf[size_col].to_numpy(), max_size)
        return pdf[[group_col, id_col, size_col, "pack_id"]]

    slim = df.select(group_col, id_col, size_col)
    return slim.groupBy(group_col).applyInPandas(pack, schema)


def pack_next_fit(
    df: DataFrame,
    group_col: str,
    id_col: str,
    size_col: str,
    max_size: int,
) -> DataFrame:
    """Next-fit packing per group in ascending ``id_col`` order.

    Returns (group, id, size, pack_id) with pack_id 1-based and
    contiguous per group. A document larger than ``max_size`` becomes a
    singleton pack (never split, never dropped) — same convention on
    the oracle side.
    """
    return _pack_grouped(df, group_col, id_col, size_col, max_size, _next_fit_kernel)


def pack_first_fit_decreasing(
    df: DataFrame,
    group_col: str,
    id_col: str,
    size_col: str,
    max_size: int,
) -> DataFrame:
    """FFD packing per group: tighter packs than next-fit, deterministic
    via the (size desc, id asc) placement order."""
    return _pack_grouped(df, group_col, id_col, size_col, max_size, _ffd_kernel)


def pack_stats(packed: DataFrame, group_col: str, size_col: str, max_size: int) -> DataFrame:
    """Per-group packing quality: pack count and mean fill ratio."""
    per_pack = packed.groupBy(group_col, "pack_id").agg(
        F.sum(size_col).alias("pack_size"), F.count(F.lit(1)).alias("n_docs")
    )
    return per_pack.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.avg(F.least(F.col("pack_size"), F.lit(max_size)) / max_size), 4).alias(
            "mean_fill"
        ),
    )
