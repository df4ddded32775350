"""Spill-posture probe: does the engine DEGRADE TO DISK, not OOM,
when shuffle/aggregation state exceeds executor memory?

At 100 TB the question is never "does the state fit" (it won't) but
"what happens when it doesn't". Spark's answer — UnsafeExternalSorter
and spillable hash aggregation — only counts if the engine's actual
operator shapes ride those paths. This probe runs three representative
shuffle-heavy workloads TWICE, in separate JVMs: once with a 1 GiB
driver heap (local mode: driver == the only executor) and once with
8 GiB, on working sets sized ~3-4 GiB so the constrained run MUST
spill:

- ``sort_global``  — a ~3 GiB global orderBy (range partition + sort),
  the surrogate-key / zorder / topk substrate;
- ``wide_agg``     — groupBy over 30 M distinct keys (hash-agg state
  >> heap, forcing the sort-based fallback), the agg_groupby /
  heavy-hitters substrate;
- ``dedup_exact``  — the engine's own exact_dedup (md5-fingerprint
  groupBy, operators/dedupe.py) over 20 M synthesized docs with
  planted duplicates, the corpus-dedup substrate.

For each workload each child records wall seconds and the UI REST
API's memory/disk spill deltas, plus a content checksum (native
xxhash64 fold) and conservation invariants (sort: per-partition
min/max boundaries monotone + non-overlapping, counts conserved).
The parent asserts:

1. the constrained run spilled (>0 bytes) on every workload — i.e. the probe
   genuinely exceeded memory, nothing silently cached its way out;
2. every checksum is IDENTICAL across the two heaps — spilling changed
   the cost, not one value;
3. both runs completed — no OOM.

    python scripts/spill_probe.py            # parent; prints one JSON line
    SPILL_PROBE_ROWS=5000000 python ...      # smaller/faster variant

Env: SPILL_PROBE_MEMS (default "1g,8g"; below ~1g JDK-17 G1 aborts on
GCLocker retries before Spark can spill — see the extraJavaOptions
note), SPILL_PROBE_ROWS (default 40000000 sort rows; agg/dedup scale
proportionally), SPILL_PROBE_PARTS (shuffle partitions, default 64),
SPILL_PROBE_OOM_CONTROL=0 to skip the 8-partition control child.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("SPILL_PROBE_ROWS", "40000000"))


# ---------------------------------------------------------------- child

def _spill_totals(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all stages,
    via the UI REST API (the only place task-level spill metrics
    surface without a Scala listener)."""
    base = spark.sparkContext.uiWebUrl  # e.g. http://host:4040
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def _run_child() -> None:
    from pyspark.sql import functions as F

    from books2scrape_etl_spark.operators.dedupe import exact_dedup
    from books2scrape_etl_spark.queries import freeze_registry_heap
    from books2scrape_etl_spark.session import get_spark

    freeze_registry_heap()
    spark = get_spark(
        app_name=f"spill_probe_{os.environ['SPARK_GRAFT_DRIVER_MEM']}",
        # 64 partitions keeps the per-task slice (~50 MiB of a 3.2 GiB
        # sort) the realistic cluster shape; the parent also records an
        # 8-partition control (~400 MiB/task vs ~50 MiB task execution
        # memory) — which STILL completes by spilling once the GCLocker
        # pathology below is bypassed.
        shuffle_partitions=int(os.environ.get("SPILL_PROBE_PARTS", "64")),
        extra_conf={
            "spark.ui.enabled": "true",
            # JDK-17 G1 at near-minimum heaps aborts with "Retried
            # waiting for GCLocker too often" long before real memory
            # exhaustion: compression codecs pin buffers via
            # JNI-critical sections and the default 2 retries give up
            # under allocation pressure (measured here at 700m-1g).
            # More retries let the JVM reach the spill paths under
            # test instead of dying in the GC driver.
            "spark.driver.extraJavaOptions": (
                "-XX:+UnlockDiagnosticVMOptions "
                "-XX:GCLockerRetryAllocationCount=64"
            ),
        },
    )
    out: dict = {"mem": os.environ["SPARK_GRAFT_DRIVER_MEM"], "workloads": {}}

    def measured(name: str, fn) -> None:
        m0, d0 = _spill_totals(spark)
        t0 = time.time()
        checks = fn()
        wall = round(time.time() - t0, 2)
        m1, d1 = _spill_totals(spark)
        out["workloads"][name] = {
            "wall_s": wall,
            "mem_spilled_mb": round((m1 - m0) / 2**20, 1),
            "disk_spilled_mb": round((d1 - d0) / 2**20, 1),
            **checks,
        }

    # -- sort_global: ~80 B/row * ROWS ≈ 3.2 GiB through a global sort.
    def sort_global() -> dict:
        src = spark.range(ROWS).select(
            F.xxhash64("id").alias("k"),
            F.repeat(F.format_string("%019d", F.col("id")), 4).alias("payload"),
        )
        parts = (
            src.orderBy("k")
            .select("k", F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .agg(F.min("k").alias("lo"), F.max("k").alias("hi"),
                 F.count(F.lit(1)).alias("n"),
                 # pmod-bounded terms: a raw sum of full-range xxhash64
                 # values overflows int64 under ANSI within ~2^32 rows
                 F.sum(F.pmod(F.col("k"), F.lit(1_000_000_007))).alias("s"))
            .orderBy("pid")
            .collect()  # one row per partition (<= shuffle partitions)
        )
        assert sum(r.n for r in parts) == ROWS, "rows lost/duplicated in sort"
        for a, b in zip(parts, parts[1:]):
            assert a.hi <= b.lo, f"range boundaries overlap: {a} {b}"
        return {"checksum": sum(r.s for r in parts) % 2**63,
                "n_partitions": len(parts)}

    # -- wide_agg: 1.5 * ROWS rows into ROWS*0.75 distinct keys — hash
    # aggregation state far beyond the constrained heap.
    def wide_agg() -> dict:
        n = ROWS * 3 // 2
        keys = ROWS * 3 // 4
        agg = (
            spark.range(n)
            .groupBy((F.col("id") % keys).alias("g"))
            .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("c"))
        )
        row = agg.select(
            F.sum(F.pmod(F.xxhash64("g", "s", "c"), F.lit(1_000_000_007))).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        assert row.n == keys, f"expected {keys} groups, got {row.n}"
        return {"checksum": row.h % 2**63, "n_groups": row.n}

    # -- dedup_exact: the engine's real L1 operator over ROWS/2 docs,
    # 4 planted copies per content (distinct texts = ROWS/8).
    def dedup() -> dict:
        n = ROWS // 2
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("the quick brown fox jumps over document number "),
                F.format_string("%019d", F.col("id") % (n // 4)),
            ).alias("text"),
        )
        surv = exact_dedup(docs)
        row = surv.select(
            F.sum(
                F.pmod(F.xxhash64("doc_id", "fp", "n_copies"), F.lit(1_000_000_007))
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        assert row.n == n // 4, f"expected {n // 4} survivors, got {row.n}"
        return {"checksum": row.h % 2**63, "n_survivors": row.n}

    measured("sort_global", sort_global)
    measured("wide_agg", wide_agg)
    measured("dedup_exact", dedup)
    spark.stop()
    print("CHILD_JSON:" + json.dumps(out))


# --------------------------------------------------------------- parent

def _spawn(mem: str, parts: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.update(
        SPILL_PROBE_CHILD="1",
        SPARK_GRAFT_DRIVER_MEM=mem,
        SPILL_PROBE_PARTS=parts,
        # 8 threads: fewer concurrent tasks -> a bigger working set
        # per task, the honest constrained-executor shape.
        SPARK_GRAFT_CPUS="8",
    )
    return subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=3600,
    )


def main() -> None:
    mems = os.environ.get("SPILL_PROBE_MEMS", "1g,8g").split(",")
    runs: dict[str, dict] = {}
    for mem in mems:
        p = _spawn(mem, os.environ.get("SPILL_PROBE_PARTS", "64"))
        line = next(
            (l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON:")), None
        )
        assert p.returncode == 0 and line, (
            f"child {mem} failed (rc={p.returncode}):\n{p.stdout[-2000:]}\n"
            f"{p.stderr[-4000:]}"
        )
        runs[mem] = json.loads(line[len("CHILD_JSON:"):])

    # Control: the SAME constrained heap with 8x-oversized partitions
    # (~400 MiB of sort per task). Recorded, not asserted — measured
    # outcome: completes by spilling too; the only way we ever got this
    # JVM to die was the GCLocker abort, never true memory exhaustion.
    if os.environ.get("SPILL_PROBE_OOM_CONTROL", "1") == "1":
        c = _spawn(mems[0], "8")
        runs["oom_control"] = {
            "mem": mems[0], "partitions": 8,
            "completed": c.returncode == 0,
            "oom": "OutOfMemoryError" in (c.stdout + c.stderr),
        }

    small, big = runs[mems[0]], runs[mems[-1]]
    for wl, res in small["workloads"].items():
        spilled = res["mem_spilled_mb"] + res["disk_spilled_mb"]
        assert spilled > 0, f"{wl}: constrained run did not spill — probe too small"
        assert res["checksum"] == big["workloads"][wl]["checksum"], (
            f"{wl}: checksum drifted under spill: "
            f"{res['checksum']} vs {big['workloads'][wl]['checksum']}"
        )
    print(json.dumps({"metric": "spill_probe", "rows": ROWS, "runs": runs,
                      "ok": True}))


if __name__ == "__main__":
    if os.environ.get("SPILL_PROBE_CHILD"):
        _run_child()
    else:
        main()
