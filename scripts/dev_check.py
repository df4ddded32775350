"""Dev loop: run all (or named) qnames against the DuckDB oracle at a
given SF and print one status line each. Usage:
    python scripts/dev_check.py [--sf DIR] [qname ...]
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from books2scrape_etl_spark.queries import ORACLE_SQL, QUERIES
from books2scrape_etl_spark.session import get_spark
from tests.oracle import compare, run_oracle


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    names = args or sorted(QUERIES)
    spark = get_spark(app_name="dev_check", extra_conf={"spark.sql.shuffle.partitions": "8"})
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            if name in ORACLE_SQL:
                problems = compare(sdf, run_oracle(ORACLE_SQL[name], sf_dir))
                status = "OK" if not problems else f"MISMATCH {problems[:4]}"
            else:
                n = sdf.count()
                status = f"rows-only n={n}" if n >= 0 else "EMPTY?"
            if "MISMATCH" in status:
                failures += 1
        except Exception as e:
            status = f"ERROR {type(e).__name__}: {str(e)[:300]}"
            failures += 1
            if "--tb" in sys.argv:
                traceback.print_exc()
        print(f"{name:24s} {time.time()-t0:6.1f}s  {status}", flush=True)
    print(f"\n{len(names)-failures}/{len(names)} passing")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
