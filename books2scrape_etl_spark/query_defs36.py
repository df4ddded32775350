"""Wave-36 (round-9 continuation): C4-style global line-level dedup.

The C4 pipeline (Raffel et al. 2020, "Exploring the Limits of Transfer
Learning…", §2.2) deduplicates the corpus at sub-document granularity:
any span that occurs more than once ANYWHERE in the corpus is removed
from all but its first occurrence, and documents are reassembled from
their surviving spans. That global keep-first-occurrence semantics is
the part that is interesting at 100 TB — every span must rendezvous
with every other copy of itself exactly once, corpus-wide.

Adaptation to this corpus: documents.text is synthetic single-spaced
word stream with no newlines or punctuation, so "line" here is a fixed
non-overlapping 10-word segment (the chunk_docs convention, stride ==
width). Two PLANTED docs with known duplicate segments (negative
doc_ids, so they can never collide with organic ids) guarantee the
dedup path provably fires — the `embed_near_dup` planted-input
precedent; organic docs flow through the identical logic on both
sides, so any organic duplicates are value-checked too.

Scale posture: the rendezvous is a md5-keyed aggregation
(min(composite) per line hash — map-side partial, skew-safe even if
one line repeats millions of times) followed by an equi-join back on
(hash, composite) — both distinct per group, no fan-out. Only
(md5, doc_id, line_no) shuffles for the argmin; full line text rides
the join only to reassemble. No windows, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.registry import register

# Planted docs: 10-word segments built from corpus vocabulary.
# seg A appears in BOTH planted docs (cross-doc dup) and TWICE in doc
# -2 (within-doc dup); seg B / seg C are unique. Keep-first on the
# composite (doc_id, line_no) key — with doc -2 < doc -1 — means doc
# -2 keeps its first copy of A and loses its second; doc -1 loses A.
_SEG_A = "spark table scan join agg window sort merge batch stream"
_SEG_B = "key value row column part hash filter group query data"
_SEG_C = "fast slow big small line vector customer order the a"
_PLANTED = (
    (-2, f"{_SEG_A} {_SEG_C} {_SEG_A}"),  # A, C, A -> keeps A(first), C
    (-1, f"{_SEG_A} {_SEG_B}"),  # A, B -> keeps only B
)

_W = 10  # words per line segment

_PLANTED_VALUES = ", ".join(
    "(CAST({} AS BIGINT), '{}')".format(i, t) for i, t in _PLANTED
)

_LINE_DEDUP_SQL = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES {_PLANTED_VALUES}) pv(doc_id, text)
),
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs),
lines AS (
  SELECT doc_id, CAST(i AS BIGINT) AS line_no,
         array_to_string(w[(i * {_W} + 1):(i * {_W} + {_W})], ' ') AS line
  FROM words, UNNEST(generate_series(0, (array_length(w) - 1) // {_W})) AS t(i)
),
keyed AS (
  SELECT doc_id, line_no, line, md5(line) AS k,
         doc_id * 100000 + line_no AS composite
  FROM lines
),
firsts AS (SELECT k, MIN(composite) AS first_c FROM keyed GROUP BY k),
kept AS (
  SELECT keyed.doc_id, keyed.line_no, keyed.line
  FROM keyed JOIN firsts
    ON keyed.k = firsts.k AND keyed.composite = firsts.first_c
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(line, ' ' ORDER BY line_no) AS out_text
  FROM kept GROUP BY doc_id
)
SELECT l.doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       COALESCE(MIN(p.n_kept), 0) AS n_kept,
       md5(COALESCE(MIN(p.out_text), '')) AS out_md5
FROM lines l LEFT JOIN per_doc p USING (doc_id)
GROUP BY l.doc_id
"""


@register("line_dedup", _LINE_DEDUP_SQL)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global line dedup: segment every document into
    non-overlapping 10-word lines, keep only the corpus-wide FIRST
    occurrence of each distinct line (min (doc_id, line_no), encoded
    as one order-preserving BIGINT — line_no < 100000 by construction),
    reassemble surviving lines in order, and report per-doc
    (n_lines, n_kept, md5-of-reassembled-text). Planted docs -1/-2
    share a segment, so drops provably occur (doc -1 keeps 1 of 2
    lines, doc -2 keeps 2 of 3)."""
    docs = read_table(spark, "documents", sf_dir).select("doc_id", "text")
    planted = spark.createDataFrame(list(_PLANTED), "doc_id long, text string")
    all_docs = docs.union(planted)

    words = all_docs.select("doc_id", F.split("text", " ").alias("w"))
    lines = words.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int((size(w) - 1) div {_W})),"
                f" i -> array_join(slice(w, i * {_W} + 1, {_W}), ' '))"
            )
        ).alias("line_no", "line"),
    ).select("doc_id", F.col("line_no").cast("long").alias("line_no"), "line")

    keyed = lines.select(
        "doc_id",
        "line_no",
        "line",
        F.md5("line").alias("k"),
        (F.col("doc_id") * 100000 + F.col("line_no")).alias("composite"),
    )
    firsts = keyed.groupBy("k").agg(F.min("composite").alias("first_c"))
    kept = keyed.join(
        firsts,
        (keyed["k"] == firsts["k"]) & (keyed["composite"] == firsts["first_c"]),
    ).select(keyed["doc_id"], "line_no", "line")

    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("out_text"),
    )
    return (
        lines.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.md5(F.coalesce("out_text", F.lit(""))).alias("out_md5"),
        )
    )
