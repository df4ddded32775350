"""Scale-path operator tests: the distributed constructions must be
semantically identical to their exact forms."""

from pyspark.sql import functions as F

from books2scrape_etl_spark.operators.scale import dense_ids_scale, salted_join
from books2scrape_etl_spark.plans.star import build_dim


def test_dense_ids_scale_matches_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    scale = dense_ids_scale(li, ["l_partkey", "l_suppkey"], "id", num_partitions=8)
    exact = build_dim(li, ["l_partkey", "l_suppkey"], "id")
    s = {(r.l_partkey, r.l_suppkey): r.id for r in scale.collect()}
    e = {(r.l_partkey, r.l_suppkey): r.id for r in exact.collect()}
    assert s == e  # bit-identical to the global row_number


def test_dense_ids_dense_unique(spark):
    df = spark.createDataFrame([(i % 97,) for i in range(1000)], "k int")
    ids = [r.id for r in dense_ids_scale(df, ["k"], "id", num_partitions=5).collect()]
    assert sorted(ids) == list(range(1, 98))


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"), "l_quantity", "l_linenumber"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    plain = li.join(orders, "k").groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, orders, "k", salt_buckets=4, salt_src=["k", "l_linenumber"])
        .groupBy("o_orderpriority")
        .count()
    )
    assert {(r.o_orderpriority, r["count"]) for r in plain.collect()} == {
        (r.o_orderpriority, r["count"]) for r in salted.collect()
    }
