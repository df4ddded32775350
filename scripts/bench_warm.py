"""Warm repeat-probe bench — the REGRESSION detector (BASELINE.md
round-8 protocol).

Cold totals from bench.py detect the HOST's mode (this machine drifts
20-30% within minutes and has a documented 2-4x cold/codegen
degradation state); they cannot attribute a slowdown to code. This
probe runs each headline query N times inside ONE warm JVM and reports
the minimum (steady-state plan-build + execution, codegen amortized),
which round 8 showed is stable enough to catch a 2.5x driver-side
regression that cold totals buried in noise.

Usage:  python scripts/bench_warm.py [qname ...]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
        SPARK_GRAFT_CPUS   (default 32)
        WARM_ITERS         (default 3)
Prints one JSON line: {"metric": "warm_min_total", "value": <sum of
per-query minima>, "queries": {name: [t1, t2, ...]}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from books2scrape_etl_spark.queries import QUERIES, freeze_registry_heap  # noqa: E402
from books2scrape_etl_spark.session import get_spark  # noqa: E402
from bench import HEADLINE, force  # noqa: E402


def main() -> None:
    import gc

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("WARM_ITERS", "3"))
    names = sys.argv[1:] or HEADLINE
    freeze_registry_heap()  # explicit perf-entry GC posture (ADVICE r8)
    print(f"gc.get_freeze_count()={gc.get_freeze_count()}", file=sys.stderr)
    spark = get_spark(app_name="bench_warm")
    spark.range(1000).selectExpr("sum(id)").collect()

    per_query: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        runs = []
        for _ in range(iters):
            t0 = time.time()
            force(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        per_query[name] = runs

    total = round(sum(min(r) for r in per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "warm_min_total",
                "value": total,
                "unit": "sec",
                "iters": iters,
                "queries": per_query,
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
