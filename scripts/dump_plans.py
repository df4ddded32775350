"""Dump .explain("formatted") for named qnames to plans/<round>/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <round_dir> <tag> qname [qname ...]
Plans are built (not executed) at $SPARK_GRAFT_SF_DIR (default sf0.1) so
the dumps show the same scan/exchange shapes the bench runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from books2scrape_etl_spark.queries import QUERIES, freeze_registry_heap
from books2scrape_etl_spark.session import get_spark


def main() -> int:
    round_dir, tag, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    freeze_registry_heap()
    spark = get_spark(app_name="dump_plans")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
