"""CBO join-reorder win, measured (round 11): how much intermediate
volume does the optimizer's reorder of `join_reorder_cbo`'s
deliberately bad join order actually save?

The qname + plan test prove the TREE flips (query_defs38); this probe
reads the executed plan's join metrics to quantify it. The written
order joins fact x fact first and filters through the tiny dim last,
so its FIRST join materializes every lineitem match; the reordered
plan pushes the ~1/5-selective customer filter through orders before
lineitem ever joins. At 100 TB the difference is materializing (and,
in a shuffle join, exchanging) the full fact-fact join versus a
filtered slice — the first-join output row count below IS that ratio.

    python scripts/cbo_reorder_probe.py                  # sf0.01
    CBO_PROBE_SF_DIR=/root/testdata/sf0.1 python ...     # scale point

Prints one JSON line: per-variant wall seconds, the first (deepest)
join's output rows, and the value-equality check (reorder is a pure
optimization).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CBO_PROBE_SF_DIR", "/root/testdata/sf0.01")


def _walk(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        if "QueryStage" in n.getClass().getSimpleName():
            stack.append(n.plan())
        ch = n.children().iterator()
        while ch.hasNext():
            stack.append(ch.next())


def join_output_rows(df) -> list[tuple[str, int]]:
    """(join node name, numOutputRows) for every join in the executed
    plan, deepest last."""
    jplan = df._jdf.queryExecution().executedPlan()
    if "Adaptive" in jplan.getClass().getSimpleName():
        jplan = jplan.executedPlan()
    out = []
    for n in _walk(jplan):
        name = n.nodeName()
        if "Join" not in name:
            continue
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                out.append((name, int(kv._2().value())))
    return out


def main() -> int:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from books2scrape_etl_spark.query_defs38 import build_cbo_join, cbo_conf_guard

    def run(label: str, guard):
        t0 = time.time()
        if guard:
            with cbo_conf_guard(spark):
                df = build_cbo_join(spark, SF_DIR)
                rows = df.collect()
                joins = join_output_rows(df)
        else:
            df = build_cbo_join(spark, SF_DIR)
            rows = df.collect()
            joins = join_output_rows(df)
        return {
            "wall_sec": round(time.time() - t0, 2),
            # the deepest join executes first; its output is the
            # intermediate the next join consumes
            "first_join_rows": joins[-1][1] if joins else None,
            "joins": [f"{n}:{r}" for n, r in joins],
            "result": sorted(map(tuple, rows)),
        }

    off = run("cbo_off", guard=False)
    on = run("cbo_on", guard=True)
    same = off.pop("result") == on.pop("result")
    out = {
        "sf_dir": SF_DIR,
        "cbo_off": off,
        "cbo_on": on,
        "intermediate_reduction": (
            round(off["first_join_rows"] / on["first_join_rows"], 1)
            if off["first_join_rows"] and on["first_join_rows"]
            else None
        ),
        "values_equal": same,
    }
    print(json.dumps(out))
    spark.stop()
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
