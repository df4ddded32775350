"""Degenerate-input sweep over the operator library's public API.

At 100 TB the engine's operators routinely receive inputs a demo never
shows: a filter that matches nothing (whole-input EMPTY), a stratum
with one row, an all-null column, a document shorter than the window.
Every operator must stay total on those — no crash, output schema
intact, row count matching the documented semantics. This module pins
that contract for each DataFrame-level entry point; per-operator value
semantics live in the operators' own test modules.
"""

import pytest
from pyspark.sql import functions as F

from books2scrape_etl_spark.operators.asof import asof_join
from books2scrape_etl_spark.operators.binning import (
    bin_fixed,
    bin_quantile_approx,
    bin_quantile_exact,
)
from books2scrape_etl_spark.operators.chunking import chunk_docs
from books2scrape_etl_spark.operators.dedupe import (
    connected_components,
    connected_components_star,
    exact_dedup,
    minhash_dedup,
)
from books2scrape_etl_spark.operators.multimodal import decode_image
from books2scrape_etl_spark.operators.packing import (
    pack_first_fit_decreasing,
    pack_next_fit,
    pack_stats,
)
from books2scrape_etl_spark.operators.privacy import pii_stats
from books2scrape_etl_spark.operators.sampling import (
    mixture_sample,
    split_assign,
    stratified_sample,
    stratified_sample_threshold,
    weighted_sample,
)
from books2scrape_etl_spark.operators.scale import (
    dense_ids_scale,
    ntile_scale,
    topk_per_group_scale,
)
from books2scrape_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign_pandas,
    lsh_topk,
)
from books2scrape_etl_spark.operators.sketch import kmv_distinct
from books2scrape_etl_spark.operators.text import text_stats
from books2scrape_etl_spark.operators.winnow import (
    decontaminate,
    winnow_fingerprints,
)
from books2scrape_etl_spark.operators.scd import scd2_apply

DOCS_SCHEMA = "doc_id long, text string, lang string, source string"


def docs_df(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return docs_df(spark, [])


@pytest.fixture(scope="module")
def one_doc(spark):
    return docs_df(spark, [(1, "the quick brown fox jumps", "en", "web")])


@pytest.fixture(scope="module")
def null_text_docs(spark):
    return docs_df(spark, [(1, None, "en", "web"), (2, "", "en", "web")])


# ---------------------------------------------------------------- binning


def test_binning_empty(spark):
    df = spark.createDataFrame([], "x double, id long")
    assert df.withColumn("t", bin_fixed("x", (0, 1, 2), ("a", "b"))).count() == 0
    assert bin_quantile_exact(df, "x", ["a", "b"], tiebreak=["id"]).count() == 0
    approx = bin_quantile_approx(df, "x", ["a", "b", "c"])
    assert approx.count() == 0
    assert "tier" in approx.columns


def test_binning_single_row(spark):
    df = spark.createDataFrame([(2.5, 1)], "x double, id long")
    exact = bin_quantile_exact(df, "x", ["lo", "mid", "hi"], tiebreak=["id"]).collect()
    assert [r["tier"] for r in exact] == ["lo"]  # ntile(3) of 1 row -> tile 1
    approx = bin_quantile_approx(df, "x", ["lo", "mid", "hi"]).collect()
    assert len(approx) == 1 and approx[0]["tier"] in ("lo", "mid", "hi")


def test_binning_all_null_values(spark):
    df = spark.createDataFrame([(None, 1), (None, 2)], "x double, id long")
    rows = df.withColumn("t", bin_fixed("x", (0, 1, 2), ("a", "b"))).collect()
    assert [r["t"] for r in rows] == [None, None]  # null -> overflow label (null)
    # approx edges over all-null column come back empty -> everything
    # falls to the terminal CASE branch; no crash is the contract
    assert bin_quantile_approx(df, "x", ["a", "b"]).count() == 2


# ------------------------------------------------------------------ text


def test_text_stats_degenerate(spark, empty_docs, null_text_docs):
    assert text_stats(empty_docs).count() == 0
    rows = {r["doc_id"]: r for r in text_stats(null_text_docs).collect()}
    assert set(rows) == {1, 2}  # null and empty text both keep their row


# -------------------------------------------------------------- sampling


def test_sampling_empty(spark, empty_docs):
    assert split_assign(empty_docs, "doc_id").count() == 0
    assert stratified_sample(empty_docs, ["lang"], "doc_id", 5).count() == 0
    assert stratified_sample_threshold(empty_docs, ["lang"], "doc_id", 5).count() == 0
    assert weighted_sample(empty_docs, F.lit(0.5), "doc_id").count() == 0
    assert mixture_sample(empty_docs, "source", "doc_id", {"web": 2.5}).count() == 0


def test_sampling_quota_exceeds_stratum(spark, one_doc):
    assert stratified_sample(one_doc, ["lang"], "doc_id", 100).count() == 1
    out = stratified_sample_threshold(one_doc, ["lang"], "doc_id", 100)
    assert out.count() == 1


# --------------------------------------------------------------- packing


def test_packing_empty_and_oversized(spark):
    empty = spark.createDataFrame([], "lang string, doc_id long, n long")
    assert pack_next_fit(empty, "lang", "doc_id", "n", 100).count() == 0
    assert pack_first_fit_decreasing(empty, "lang", "doc_id", "n", 100).count() == 0
    assert pack_stats(
        pack_next_fit(empty, "lang", "doc_id", "n", 100), "lang", "n", 100
    ).count() == 0
    # an item larger than max_size becomes a singleton pack (documented)
    over = spark.createDataFrame([("en", 1, 500)], "lang string, doc_id long, n long")
    for kernel in (pack_next_fit, pack_first_fit_decreasing):
        rows = kernel(over, "lang", "doc_id", "n", 100).collect()
        assert len(rows) == 1 and rows[0]["pack_id"] == 1


# -------------------------------------------------------------- chunking


def test_chunking_degenerate(spark, empty_docs, one_doc):
    assert chunk_docs(empty_docs).count() == 0
    rows = chunk_docs(one_doc, chunk_words=64, overlap=16).collect()
    assert len(rows) == 1 and rows[0]["n_words"] == 5  # doc shorter than one chunk


# --------------------------------------------------------------- privacy


def test_pii_stats_degenerate(spark, empty_docs, null_text_docs):
    assert pii_stats(empty_docs).count() == 0
    assert pii_stats(null_text_docs).count() == 2  # null/empty text keep rows


# ---------------------------------------------------------------- sketch


def test_kmv_degenerate(spark, empty_docs, one_doc):
    # grouped over empty: no groups, no rows
    assert kmv_distinct(empty_docs, "doc_id", ["lang"]).count() == 0
    # ungrouped over empty: one summary row estimating zero
    row = kmv_distinct(empty_docs, "doc_id").collect()
    assert len(row) == 1 and row[0]["est_dv"] == 0.0 and row[0]["exact_dv"] == 0
    row = kmv_distinct(one_doc, "doc_id").collect()[0]
    assert row["est_dv"] == 1.0 and row["exact_dv"] == 1


# ----------------------------------------------------------------- scale


def test_scale_ops_empty(spark):
    empty = spark.createDataFrame([], "k string, v long")
    assert dense_ids_scale(empty, ["k"], "id").count() == 0
    assert ntile_scale(empty, ["v", "k"], 5).count() == 0
    assert topk_per_group_scale(empty, ["k"], ["v"], 3).count() == 0


def test_scale_ops_single_row(spark):
    one = spark.createDataFrame([("a", 7)], "k string, v long")
    ids = dense_ids_scale(one, ["k"], "id").collect()
    assert len(ids) == 1 and ids[0]["id"] == 1
    tiles = ntile_scale(one, ["v", "k"], 5).collect()
    assert len(tiles) == 1 and tiles[0]["tile"] == 1  # ntile: row's own tile
    top = topk_per_group_scale(one, ["k"], ["v"], 3).collect()
    assert len(top) == 1 and top[0]["rank"] == 1


# ---------------------------------------------------------------- dedupe


def test_dedup_empty_and_empty_text(spark, empty_docs):
    assert exact_dedup(empty_docs).count() == 0
    assert minhash_dedup(empty_docs).count() == 0
    # empty-string shingle sets sign null/empty — docs must survive, not crash
    d = docs_df(
        spark,
        [(1, "", "en", "web"), (2, "", "en", "web"), (3, "some real text here", "en", "web")],
    )
    survivors = {r["doc_id"] for r in minhash_dedup(d).collect()}
    assert 3 in survivors and len(survivors) >= 1


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
    assert connected_components_star(pairs).count() == 0


# ------------------------------------------------------------ similarity


def test_similarity_empty_and_small(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(100, [1.0, 0.0])], "q_id long, q_vec array<float>"
    )
    assert brute_force_topk(emb, q, k=3).count() == 0
    assert lsh_topk(emb, q, k=3, dim=2, bits=2).count() == 0
    assert ivf_assign_pandas(emb, [[1.0, 0.0], [0.0, 1.0]]).count() == 0
    # k larger than the corpus: returns what exists, never pads
    emb2 = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert brute_force_topk(emb2, q, k=10).count() == 2


def test_kmeans_centroids_edges(spark):
    from books2scrape_etl_spark.operators.similarity import kmeans_centroids

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    # more lists than points: spark.ml returns the distinct points
    centers = kmeans_centroids(emb, n_lists=8)
    assert len(centers) == 2
    # empty training set: clear ValueError at the API boundary, not an
    # opaque executor Py4JJavaError from inside KMeans.fit
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty training set"):
        kmeans_centroids(empty, n_lists=2)


# ---------------------------------------------------------------- winnow


def test_winnow_degenerate(spark, empty_docs, one_doc):
    assert winnow_fingerprints(empty_docs).count() == 0
    # doc shorter than the k-gram window emits no fingerprints (documented)
    short = docs_df(spark, [(1, "ab", "en", "web")])
    assert winnow_fingerprints(short, k=8).count() == 0
    # empty benchmark set -> nothing is contaminated
    assert decontaminate(one_doc, F.col("doc_id") < 0).count() == 0
    assert decontaminate(empty_docs, F.col("doc_id") < 0).count() == 0


# ------------------------------------------------------------------ asof


def test_asof_join_empty_sides(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k long, t long, lv string")
    right_empty = spark.createDataFrame([], "k long, t long, rv string")
    out = asof_join(left, right_empty, on="t", by=["k"]).collect()
    assert len(out) == 1 and out[0]["asof_rv"] is None  # left-outer survives
    left_empty = spark.createDataFrame([], "k long, t long, lv string")
    right = spark.createDataFrame([(1, 5, "r")], "k long, t long, rv string")
    assert asof_join(left_empty, right, on="t", by=["k"]).count() == 0


# ------------------------------------------------------------------ scd2


def test_scd2_empty_sides(spark):
    dim = spark.createDataFrame(
        [(1, "a", 1, True)], "k long, attr string, version int, is_current boolean"
    )
    empty_updates = spark.createDataFrame([], "k long, attr string")
    out = scd2_apply(dim, empty_updates, ["k"], ["attr"], new_version=2)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["is_current"]  # no-op delta = identity
    empty_dim = spark.createDataFrame(
        [], "k long, attr string, version int, is_current boolean"
    )
    inserts = spark.createDataFrame([(9, "z")], "k long, attr string")
    rows = scd2_apply(empty_dim, inserts, ["k"], ["attr"], new_version=2).collect()
    assert len(rows) == 1 and rows[0]["k"] == 9 and rows[0]["is_current"]


# ------------------------------------------------------------ multimodal


def test_decode_image_malformed_raises_cleanly():
    for payload in (b"", b"\x00", b"GIF89a....", b"P6"):
        with pytest.raises((ValueError, IndexError)):
            decode_image(payload)
