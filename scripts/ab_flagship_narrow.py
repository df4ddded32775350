"""Interleaved A/B: flagship as shipped (string group keys through the
two COUNT DISTINCT exchanges) vs the group-key-narrowed variant
(VERDICT r12 item 1 / guide §2.3 "narrower types"): the three short
group strings (r_name, price_tier, qty_bin) become small integer ids
BEFORE the two-phase aggregate — r_regionkey from the nation join
(region decode re-attached to the 45-row final aggregate by a 5-row
broadcast join; r_name<->r_regionkey is a bijection in this data),
tier/bin ids decoded back by 3-label CASEs — so both exchanges carry
~10 bytes of keys instead of ~40+ of strings, and the fact-side
partial aggregate hashes ints instead of three strings per row.

Usage: python scripts/ab_flagship_narrow.py [reps]  (noop-sink timing,
same-JVM interleaved, min + median reported; guide §1.4/§1.5)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.io import read_table
from books2scrape_etl_spark.operators.binning import bin_quantile
from books2scrape_etl_spark.plans.flagship import (
    PRICE_LABELS,
    QTY_EDGES,
    QTY_LABELS,
    flagship,
)
from books2scrape_etl_spark.queries import freeze_registry_heap
from books2scrape_etl_spark.session import get_spark


def flagship_narrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    customer = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    part = read_table(spark, "part", sf_dir)

    part_tiered = bin_quantile(
        part.select("p_partkey", "p_retailprice"),
        "p_retailprice",
        PRICE_LABELS,
        out_col="price_tier",
        tiebreak=("p_partkey",),
    )
    tier_id = F.coalesce(
        *[
            F.when(F.col("price_tier") == lab, F.lit(i + 1))
            for i, lab in enumerate(PRICE_LABELS)
        ]
    ).cast("tinyint")
    part_tiered = part_tiered.select("p_partkey", tier_id.alias("__tier_id"))

    lo = [F.lit(float(e)) for e in QTY_EDGES]
    qty_bin_id = F.coalesce(
        *[
            F.when(
                (F.col("l_quantity") >= lo[i]) & (F.col("l_quantity") < lo[i + 1]),
                F.lit(i + 1),
            )
            for i in range(len(QTY_LABELS))
        ]
    ).cast("tinyint")

    enriched = (
        lineitem.withColumn(
            "revenue", F.col("l_extendedprice") * (1 - F.col("l_discount"))
        )
        .withColumn("__bin_id", qty_bin_id)
        .withColumn(
            "is_returned", F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        )
        .join(
            F.broadcast(part_tiered),
            lineitem["l_partkey"] == part_tiered["p_partkey"],
            "inner",
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "inner",
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "inner",
        )
        .join(
            F.broadcast(region.select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
            "inner",
        )
    )

    keys = ["r_regionkey", "__tier_id", "__bin_id"]
    pre = enriched.groupBy(*keys, "l_orderkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("revenue").cast("decimal(18,4)")).alias("_rev"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty"),
        F.count("l_quantity").alias("_qn"),
        F.sum("is_returned").alias("_ret"),
    )
    agg = pre.groupBy(*keys).agg(
        F.sum("_n").alias("n_lines"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("_rev").cast("double").alias("sum_revenue"),
        (F.sum("_qty").cast("double") / F.sum("_qn")).alias("avg_qty"),
        F.sum("_ret").alias("n_returned"),
    )
    # decode the narrow keys on the 45-row aggregate: 5-row broadcast
    # join for r_name, 3-label CASEs for the tier/bin strings
    price_tier = F.element_at(
        F.array(*[F.lit(x) for x in PRICE_LABELS]), F.col("__tier_id").cast("int")
    )
    qty_bin = F.element_at(
        F.array(*[F.lit(x) for x in QTY_LABELS]), F.col("__bin_id").cast("int")
    )
    return agg.join(
        F.broadcast(read_table(spark, "region", sf_dir).select("r_regionkey", "r_name")),
        "r_regionkey",
    ).select(
        "r_name",
        price_tier.alias("price_tier"),
        qty_bin.alias("qty_bin"),
        "n_lines",
        "n_orders",
        "sum_revenue",
        "avg_qty",
        "n_returned",
    )


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    freeze_registry_heap()
    spark = get_spark(app_name="ab_flagship_narrow")
    spark.range(1000).selectExpr("sum(id)").collect()

    # value parity first (order-insensitive row-set compare)
    a = {tuple(map(str, r)) for r in flagship(spark, sf_dir).collect()}
    b = {tuple(map(str, r)) for r in flagship_narrow(spark, sf_dir).collect()}
    assert a == b, f"value mismatch: only_wide={list(a - b)[:3]} only_narrow={list(b - a)[:3]}"
    print(f"parity OK ({len(a)} rows)", file=sys.stderr)

    times = {"wide": [], "narrow": []}
    for i in range(reps):
        for name, fn in (("wide", flagship), ("narrow", flagship_narrow)):
            spark.sparkContext.setJobDescription(f"ab {name} rep{i}")
            t0 = time.time()
            force(fn(spark, sf_dir))
            times[name].append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    for name, ts in times.items():
        ts_sorted = sorted(ts)
        print(
            f"{name}: min={ts_sorted[0]:.3f} med={ts_sorted[len(ts) // 2]:.3f} all={ts}"
        )


if __name__ == "__main__":
    main()
