"""AQE skew-join x bucketing: the negative composition, measured.

SCALE.md's skew guidance offers two mitigations — AQE's runtime
skew-split or explicit salting. dpp_bucket_probe proves salting
composes with the bucketed warehouse layout; this probe proves the
OTHER mitigation does NOT: AQE's OptimizeSkewedJoin rewrites skewed
*shuffle reads* (it splits a fat post-shuffle partition into multiple
task reads), and a bucket-local sort-merge join has no shuffle read
to rewrite — the skewed bucket is welded to one task by the file
layout. At 100 TB this is a real design decision: bucketing the fact
on a join key buys a shuffle-free join but FORFEITS AQE's skew safety
net on that key, so a key with known hot values needs explicit
salting (or a different bucket key), not AQE.

Setup: a skewed join key synthesized from lineitem — ~30% of fact
rows collapse onto key 0, the rest keep their orderkey — joined to a
UNIQUE-keyed dim built from the distinct keys (so the join output
size equals the fact size and the skew lives entirely in the key
distribution, not in row multiplication). Both inputs are LANDED to
parquet first, for two reasons discovered the hard way, each a real
production behavior:

- the fact lands as 16 files: OptimizeSkewedJoin splits a skewed
  reduce partition on MAP-OUTPUT boundaries, so a shuffle fed by one
  mapper is unsplittable no matter how skewed — at probe scale one
  parquet file = one mapper = no split (at 100 TB the fact always has
  thousands of mappers, so the probe must not accidentally model the
  degenerate case);
- the dim lands plain instead of joining the `distinct()` lazily: the
  final HashAggregate a distinct leaves between the Exchange and the
  SMJ's Sort breaks the Sort-over-ShuffleStage pattern the rule
  matches, masking the effect being measured.

AQE skew thresholds are tuned down (advisory 16 KiB / threshold
32 KiB / factor 2) so the probe corpus's hot partition is
over-threshold, exactly as a 100 TB hot key would be over the
production 256 MiB-scale defaults.

Variants, same session, forced-SMJ (no broadcast):

  U — plain parquet scans, shuffle SMJ: AQE detects the hot
      partition and splits it (executed plan's SortMergeJoin carries
      ``skew=true``; the fact-side AQEShuffleRead reports more
      partitions than the shuffle wrote — the split).
  B — both sides bucketed by the skew key, bucket-local SMJ: zero
      Exchange on either side, and NO ``skew=true`` anywhere — the
      mechanism is structurally unavailable, not merely unneeded
      (same data, same thresholds, same hot key).

Asserts: U's plan shows skew=true; B's plan has no Exchange on the
join keys and no skew=true; values U == B (groupBy over the join is
layout-invariant). Prints one JSON line; exit 0 iff all hold.

    python scripts/skew_bucket_probe.py                  # sf0.01
    SKEW_BUCKET_SF_DIR=/root/testdata/sf0.1 python ...   # scale point
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

SF_DIR = os.environ.get("SKEW_BUCKET_SF_DIR", "/root/testdata/sf0.01")
SCRATCH = "/tmp/spark_graft_scratch/skew_bucket_probe"


def exec_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Tune AQE's skew detection to the probe corpus (production
    # defaults are 256 MiB-scale; the RATIO semantics are identical)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    for t in ("skb_fact", "skb_dim"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    # ~30% of fact rows collapse onto skew_key 0; dim is UNIQUE per key
    fact = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            F.when(F.col("l_orderkey") % 10 < 3, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .alias("skew_key"),
            "l_extendedprice",
        )
    )
    dim = fact.select("skew_key").distinct().withColumn(
        "key_class", (F.col("skew_key") % 7).cast("int")
    )

    t0 = time.time()
    # plain copies for variant U (16 fact files -> 16 mappers, see
    # docstring; dim landed so no distinct-aggregate shields the SMJ)
    fact.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SCRATCH, "fact_plain")
    )
    dim.write.mode("overwrite").parquet(os.path.join(SCRATCH, "dim_plain"))
    # bucketed copies for variant B
    (
        fact.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "skew_key")
        .sortBy("skew_key")
        .option("path", os.path.join(SCRATCH, "fact"))
        .saveAsTable("skb_fact")
    )
    (
        dim.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "skew_key")
        .sortBy("skew_key")
        .option("path", os.path.join(SCRATCH, "dim"))
        .saveAsTable("skb_dim")
    )
    t_land = time.time() - t0

    def query(f, d):
        return (
            f.hint("merge")
            .join(d, "skew_key")
            .groupBy("key_class")
            .agg(
                F.count(F.lit(1)).alias("n"),
                sum_exact("l_extendedprice", 2).alias("sum_price"),
            )
            .orderBy("key_class")
        )

    def run(f, d):
        t0 = time.time()
        df = query(f, d)
        rows = df.collect()
        plan = exec_plan(df)
        return {
            "wall_sec": round(time.time() - t0, 2),
            "skew_split_fired": "skew=true" in plan,
            "exchanges_on_key": sum(
                1
                for l in plan.splitlines()
                if "Exchange hashpartitioning" in l and "skew_key" in l
            ),
            "result": sorted(map(tuple, rows)),
        }

    unbucketed = run(
        spark.read.parquet(os.path.join(SCRATCH, "fact_plain")),
        spark.read.parquet(os.path.join(SCRATCH, "dim_plain")),
    )
    bucketed = run(spark.table("skb_fact"), spark.table("skb_dim"))
    values_equal = unbucketed.pop("result") == bucketed.pop("result")

    out = {
        "sf_dir": SF_DIR,
        "unbucketed": unbucketed,
        "bucketed": bucketed,
        "land_sec": round(t_land, 2),
        "values_equal": values_equal,
    }
    print(json.dumps(out))
    ok = (
        values_equal
        and unbucketed["skew_split_fired"]
        and unbucketed["exchanges_on_key"] >= 2
        and not bucketed["skew_split_fired"]
        and bucketed["exchanges_on_key"] == 0
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
