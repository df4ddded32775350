"""DPP x bucketing x skew-salting composition probe (VERDICT r10
item 7, extended per VERDICT r11 item 6): the full 100 TB warehouse
access path is a fact table that is BOTH date-partitioned (so a
filtered calendar dim prunes whole directories at runtime —
`join_dpp`'s evidence) AND bucketed on its join key (so the fact-fact
join is a bucket-local sort-merge with zero Exchange —
`join_bucketed`'s evidence), feeding a downstream join on a
pathologically skewed key that must be salted (`join_salted`'s
evidence). Each pair was proven separately; this probe lands ONE
table carrying both layouts and runs ONE query exercising all three,
proving the optimizations compose rather than disable each other:

    lineitem  -> partitionBy(ship_month) + bucketBy(8, l_orderkey)
    orders    -> bucketBy(8, o_orderkey)
    month dim -> (ship_month, ship_quarter) distinct, ~83 rows
    prio dim  -> (o_orderpriority, prio_class) distinct, 5 rows

    SELECT ... FROM fact
      JOIN orders  ON l_orderkey = o_orderkey     -- bucket-local SMJ
      JOIN dim     ON fact.ship_month = dim.ship_month
      WHERE dim.ship_quarter = '1995-Q1'          -- runtime -> DPP
      JOIN prio    ON (o_orderpriority, salt)     -- salted SMJ: the
                                                  -- 5-value key would
                                                  -- land ALL volume on
                                                  -- 5 reducers unsalted
    GROUP BY o_orderpriority

Asserts on the executed plan + scan metrics:

1. the fact scan carries `dynamicpruningexpression` in its partition
   filters (DPP fired THROUGH the bucketed layout, under the extra
   join);
2. only the matching month directories are read (3 of 83 at any SF —
   scan metric `number of partitions read`);
3. the fact-orders SortMergeJoin has NO Exchange on either input
   (bucket-local);
4. the salted join's Exchange hash-partitions on (o_orderpriority,
   __salt) — the hot key's volume spreads over salt_buckets reducers
   instead of one;
5. the result is value-identical to the same query over plain
   unpartitioned, unbucketed parquet scans with a PLAIN UNSALTED
   priority join — one equality proving both layouts and the salt are
   pure optimizations.

    python scripts/dpp_bucket_probe.py                 # sf0.01
    DPP_BUCKET_SF_DIR=/root/testdata/sf0.1 python ...  # scale point

Prints one JSON line with partition counts, exchange counts, wall
seconds, and the equality check.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from books2scrape_etl_spark.functions.agg import sum_exact  # noqa: E402
from books2scrape_etl_spark.operators.scale import salted_join  # noqa: E402

SF_DIR = os.environ.get("DPP_BUCKET_SF_DIR", "/root/testdata/sf0.01")
SCRATCH = "/tmp/spark_graft_scratch/dpp_bucket_probe"


def main() -> int:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.warehouse.dir", os.path.join(SCRATCH, "wh"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    month = F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")

    t0 = time.time()
    # ONE landing with BOTH layouts: month directories, 8 orderkey
    # buckets inside each directory.
    (
        li.select("l_orderkey", "l_extendedprice", month)
        .write.mode("overwrite")
        .format("parquet")
        .partitionBy("ship_month")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(SCRATCH, "fact"))
        .saveAsTable("dppb_fact")
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    # The skewed-join dimension: 5 priorities cover ALL fact rows, so
    # an unsalted shuffle join on o_orderpriority puts every row on one
    # of 5 reducers regardless of cluster width.
    prio = o.select(
        "o_orderpriority",
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_class"),
    ).distinct()
    (
        o.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(SCRATCH, "orders"))
        .saveAsTable("dppb_orders")
    )
    t_land = time.time() - t0

    dim = (
        li.select(
            month,
            F.concat(
                F.year("l_shipdate").cast("string"),
                F.lit("-Q"),
                F.quarter("l_shipdate").cast("string"),
            ).alias("ship_quarter"),
        )
        .distinct()
    )

    def query(fact, orders, salted=True):
        joined = (
            fact.hint("merge")
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(
                dim.where(F.col("ship_quarter") == "1995-Q1"), "ship_month"
            )
        )
        if salted:
            # Composed skew handling: deterministic 8-way salt spreads
            # the 5-value hot key; the merge hint keeps the join a
            # shuffle SMJ at probe scale where AQE would broadcast the
            # 40-row exploded dim and hide the salted Exchange the
            # probe asserts on.
            joined = salted_join(
                joined.hint("merge"),
                prio,
                "o_orderpriority",
                salt_buckets=8,
                salt_src=["o_orderkey"],
            )
        else:
            joined = joined.join(prio, "o_orderpriority")
        return (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                # Exact decimal sum (ADVICE r11): a rounded double sum
                # is summation-order-dependent, and the bucketed layout
                # sums in a different order than the plain scan — a
                # boundary value could round differently and flip the
                # values_equal_plain comparison spuriously.
                sum_exact("l_extendedprice").alias("sum_price"),
                F.max("prio_class").alias("prio_class"),
            )
            .orderBy("o_orderpriority")
        )

    t0 = time.time()
    composed = query(spark.table("dppb_fact"), spark.table("dppb_orders"))
    rows = composed.collect()
    t_query = time.time() - t0

    jplan = composed._jdf.queryExecution().executedPlan()
    plan = jplan.toString()
    low = plan.lower()
    dpp_fired = "dynamicpruningexpression" in low

    # Scan metrics (the SCALE.md r10 method: runtime pruning is only
    # visible in the executed plan's scan metrics, never inputFiles()).
    # Unwrap AQE, walk to the partitioned fact scan, read its metrics.
    if "Adaptive" in jplan.getClass().getSimpleName():
        jplan_inner = jplan.executedPlan()
    else:
        jplan_inner = jplan
    parts_read = parts_total = None
    stack = [jplan_inner]
    while stack:
        node = stack.pop()
        mets = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            mets[kv._1()] = kv._2().value()
        if "numPartitions" in mets and "staticFilesNum" in mets:
            parts_read = int(mets["numPartitions"])
        cls = node.getClass().getSimpleName()
        if "QueryStage" in cls:
            # AQE stage wrappers are leaves; their real subtree hangs
            # off .plan()
            stack.append(node.plan())
        ch = node.children().iterator()
        while ch.hasNext():
            stack.append(ch.next())
        # subqueries (the DPP broadcast) live off the children list;
        # not needed for the fact-scan metrics
    parts_total = li.select(month).distinct().count()
    smj = plan.count("SortMergeJoin")
    # shuffles only (BroadcastExchange contains the substring
    # "Exchange " — exclude it): the bucket join is proven shuffle-free
    # when NO shuffle keys on the orderkey
    shuffle_lines = [
        l
        for l in plan.splitlines()
        if "Exchange hashpartitioning" in l or "Exchange rangepartitioning" in l
    ]
    bucket_join_shuffle_free = not any("orderkey" in l for l in shuffle_lines)
    # the salted join's Exchange must hash-partition on the salt (the
    # skew spread the composition exists to prove)
    salt_shuffle_present = any("__salt" in l for l in shuffle_lines)

    # plain twin: same query over raw parquet (no layouts) with a
    # PLAIN UNSALTED priority join — one equality proves both layouts
    # AND the salt are pure optimizations
    plain = query(
        li.select("l_orderkey", "l_extendedprice", month),
        o,
        salted=False,
    ).collect()
    same = sorted(map(tuple, rows)) == sorted(map(tuple, plain))

    out = {
        "sf_dir": SF_DIR,
        "dpp_fired_through_buckets": dpp_fired,
        "parts_read": parts_read,
        "parts_total": parts_total,
        "sortmergejoin_nodes": smj,
        "shuffle_exchanges": len(shuffle_lines),
        "bucket_join_shuffle_free": bucket_join_shuffle_free,
        "salt_shuffle_present": salt_shuffle_present,
        "values_equal_plain_unsalted": same,
        "n_groups": len(rows),
        "land_sec": round(t_land, 2),
        "query_sec": round(t_query, 2),
    }
    print(json.dumps(out))
    ok = (
        dpp_fired
        and same
        and smj >= 1
        and bucket_join_shuffle_free
        and salt_shuffle_present
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
