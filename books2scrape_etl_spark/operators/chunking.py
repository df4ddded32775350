"""Context-window chunking — split each document into overlapping
fixed-word-budget chunks (the 1→N shaping step between a curated
corpus and a tokenized training shard; pairs with the sequence packer
in operators/packing.py, which solves the opposite N→1 problem).

No reference analogue (the reference emits one row per book,
extract_pipeline.py:10-94) — LLM-pipeline extension mandate.

Design (100 TB posture):

- **Pure Catalyst, map-side only**: split → sequence of chunk starts →
  posexplode → slice → array_join. No shuffle, no Python, no UDF; the
  1→N fan-out happens inside whole-stage codegen and the output flows
  straight to a sink. At cluster scale the only knob that matters is
  output partition sizing (a chunk table is ~``1/stride`` larger than
  its corpus; follow with a repartition before writing if the sink
  needs bounded file sizes).
- **Deterministic boundary contract** (same formula on both engines,
  which is what the DuckDB oracle checks): words = whitespace-split of
  trimmed text; chunk starts = 0, stride, 2·stride, … for every start
  < n_words, stride = chunk_words − overlap; chunk i = words[start :
  start+chunk_words]. The final chunk may be shorter than
  ``chunk_words``; a document shorter than one chunk yields exactly
  one chunk; ``overlap`` must be < ``chunk_words``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_id, chunk_start, n_words, chunk_text) — one row per
    overlapping window of ``chunk_words`` words, stride
    ``chunk_words - overlap``."""
    if not 0 <= overlap < chunk_words:
        raise ValueError(f"need 0 <= overlap < chunk_words, got {overlap}/{chunk_words}")
    stride = chunk_words - overlap
    words = F.split(F.trim(text_col), r"\s+")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(words) - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = docs.select(
        id_col,
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
        words.alias("_words"),
    )
    chunk = F.slice("_words", F.col("chunk_start") + 1, F.lit(chunk_words))
    return exploded.select(
        id_col,
        "chunk_id",
        "chunk_start",
        F.size(chunk).alias("n_words"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def oracle_chunk_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    overlap: int = 16,
) -> str:
    """DuckDB twin of :func:`chunk_docs` (same boundary formula)."""
    stride = chunk_words - overlap
    return f"""
    WITH w AS (
      SELECT {id_col}, string_split_regex(trim({text_col}), '\\s+') AS words
      FROM {table}),
    s AS (
      SELECT {id_col}, words,
             unnest(range(0, greatest(len(words), 1), {stride})) AS chunk_start
      FROM w)
    SELECT {id_col},
           CAST(chunk_start / {stride} AS INTEGER) AS chunk_id,
           CAST(chunk_start AS INTEGER) AS chunk_start,
           CAST(len(list_slice(words, chunk_start + 1, chunk_start + {chunk_words}))
                AS INTEGER) AS n_words,
           array_to_string(
             list_slice(words, chunk_start + 1, chunk_start + {chunk_words}), ' ')
             AS chunk_text
    FROM s
    """
