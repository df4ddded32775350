"""Build a perturbed copy of an SF dir for oracle-robustness probes.

Deterministically hash-samples the fact tables (orders 90%, lineitem
90%, events 85%, documents 80%, embeddings 80%) into DST, copying the
dims intact — emulating the driver's between-round regeneration
(shifted distributions, fewer rows, broken referential completeness).
Running the full driver-sim against DST then proves no oracle silently
depends on the current data vintage:

    python scripts/mutate_testdata.py [SRC] [DST]
    cd /tmp && SIM_SF_DIR=DST python /root/repo/scripts/driver_sim.py

First run (round-9 second continuation, sf0.01 -> /tmp/sfmut):
284/284 oracle-paired pass, 0 fail, 13 rows-only — the whole registry
is data-vintage-robust (differential, law-form, planted-row, and
golden-fixture oracles all hold by construction, now measured).
"""

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfmut"

PLANS: dict[str, tuple[str, float] | None] = {
    "region": None,
    "nation": None,
    "supplier": None,
    "part": None,
    "customer": None,
    "orders": ("o_orderkey", 0.9),
    "lineitem": ("l_orderkey*10+l_linenumber", 0.9),
    "events": ("event_id", 0.85),
    "documents": ("doc_id", 0.8),
    "embeddings": ("vec_id", 0.8),
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t, plan in PLANS.items():
        q = f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        if plan:
            key, frac = plan
            q += f" WHERE (hash({key}) % 1000) < {int(frac * 1000)}"
        con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {DST}")


if __name__ == "__main__":
    main()
