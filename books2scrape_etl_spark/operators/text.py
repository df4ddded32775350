"""Text-analysis operators (SURVEY.md §2.11 L4) over the ``documents``
table — the text half of a training-data pipeline: statistics, language
ID, quality scoring, token counting, fingerprinting.

All pure Catalyst expressions (regex / length / split / md5) — no UDFs,
no shuffle except where a groupBy is the point. At 100 TB these are
embarrassingly parallel map-side ops; the only care needed is that the
regexes stay in the subset Java regex and RE2 (the oracle) agree on:
literal classes, ``\\s``, anchors — no backrefs, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.util import to_col

# language -> high-frequency stopwords (tiny n-gram-free heuristic;
# deliberately deterministic and SQL-expressible so the oracle can
# replicate it exactly)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "que", "de"),
}

WORD_RE = r"[A-Za-z]+"
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return to_col(col)


def word_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(_c(col)), r"\s+"))


def token_count_bpe_ish(col: Column | str) -> Column:
    """BPE-ish token estimate: alpha runs + digit runs + single
    punctuation marks, via one regexp_count — the standard cheap
    pre-tokenizer approximation for budgeting LLM training tokens."""
    return F.regexp_count(_c(col), F.lit(BPE_ISH_RE))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    n_punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]"))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_count(col: Column | str, words: tuple[str, ...]) -> Column:
    """Count occurrences of any of ``words`` as whole lowercase words."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(_c(col)), F.lit(pat))


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {lang: stopword_count(col, ws) for lang, ws in LANG_STOPWORDS.items()}


def lang_id(col: Column | str) -> Column:
    """Predicted language = argmax stopword-hit count, ties broken by
    fixed language order, zero hits -> 'unknown'. Pure CASE chain so the
    SQL oracle states the identical decision procedure."""
    scores = lang_scores(col)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.when(best == 0, "unknown")
    for lang in langs:  # first max wins (fixed priority)
        expr = expr.when(scores[lang] == best, lang)
    return expr


def quality_score(col: Column | str) -> Column:
    """Composite document quality in [0,1]: length band + low punctuation
    + stopword presence — the length/punct/stopword-ratio heuristic
    family used for pretraining-corpus filtering. Deterministic rational
    arithmetic (exact int counts -> one double division each)."""
    c = _c(col)
    n = F.length(c)
    len_score = F.when((n >= 200) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n < 200, n.cast("double") / F.lit(200.0)).otherwise(F.lit(0.5))
    )
    punct_score = F.when(punct_ratio(c) <= 0.1, F.lit(1.0)).otherwise(F.lit(0.5))
    stop_score = F.when(stopword_count(c, LANG_STOPWORDS["en"]) > 0, F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (len_score + punct_score + stop_score) / F.lit(3.0)


def normalize_for_fingerprint(col: Column | str) -> Column:
    """Canonical form for near-identity fingerprinting: lowercase, strip
    non-alphanumerics to single spaces, trim."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text. Collision-safe
    enough for dedup keys; stable across engines (md5 is md5)."""
    return F.md5(F.encode(normalize_for_fingerprint(col), "UTF-8"))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """L4 — one pass of per-document statistics."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(c).alias("n_chars_measured"),
        word_count(c).alias("n_words"),
        token_count_bpe_ish(c).alias("n_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fp"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the count of the most frequent element — via one ``aggregate`` fold
    (accumulator: previous element, current run, best run). Lambda
    bodies touch only the accumulator and element, so nothing outer is
    re-inlined per element."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, init, merge, lambda acc: acc["best"])


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_word_frac: float = 0.6,
    max_top_word_frac: float = 0.2,
    max_top_bigram_frac: float = 0.1,
) -> DataFrame:
    """L4 — repetition metrics per document, the word-level analogue of
    the Gopher repetition filters (Rae et al. 2021 §A1.1: duplicate-line
    / top-n-gram fractions; these documents are single-line, so the
    units are words and word-bigrams):

    - ``dup_word_frac``: fraction of words that repeat an earlier word;
    - ``top_word_frac``: count of the most frequent word / word count;
    - ``top_bigram_frac``: count of the most frequent adjacent bigram /
      bigram count;
    - ``keep``: all three under their thresholds — the corpus-filter
      verdict.

    Entirely Catalyst higher-order functions on the word array (sort,
    distinct, zip_with, one aggregate fold per metric): map-side, zero
    shuffles, no Python. Fractions are BIGINT/BIGINT IEEE divisions, so
    the DuckDB oracle (which derives the same counts by unnest+GROUP BY
    instead of a fold — an independent formulation) matches
    bit-for-bit.
    """
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    n = F.size(words).cast("long")
    nd = F.size(F.array_distinct(words)).cast("long")
    top_w = _max_run(F.array_sort(words))
    n_bg = F.greatest(n - 1, F.lit(0).cast("long"))
    bigrams = F.zip_with(
        F.slice(words, 1, n_bg.cast("int")),
        F.slice(words, 2, n_bg.cast("int")),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    top_bg = _max_run(F.array_sort(bigrams))
    one = F.lit(1).cast("long")
    dup_frac = (n - nd).cast("double") / F.greatest(n, one)
    topw_frac = top_w.cast("double") / F.greatest(n, one)
    topbg_frac = top_bg.cast("double") / F.greatest(n_bg, one)
    return docs.select(
        F.col(id_col),
        n.alias("n_words"),
        dup_frac.alias("dup_word_frac"),
        topw_frac.alias("top_word_frac"),
        topbg_frac.alias("top_bigram_frac"),
        (
            (dup_frac <= max_dup_word_frac)
            & (topw_frac <= max_top_word_frac)
            & (topbg_frac <= max_top_bigram_frac)
        ).alias("keep"),
    )
