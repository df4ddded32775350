"""Synthesize a 3x-fact dataset ("sf0.3 probe") from sf0.1 for the
core-count scaling probe (VERDICT r12 item 8): the ratio~1 queries at
sf0.1 (flagship, tpch_q5, bin_quantile) are claimed fixed-overhead-
bound, not structurally serial — showing their 8->32-core ratio grow
with input size is the evidence.

Fact tables (lineitem, orders, customer, events, documents) are
replicated 3x with key offsets that preserve referential integrity
(copy i shifts l_orderkey/o_orderkey by i*K_ORD, o_custkey/c_custkey
by i*K_CUST, event_id/doc_id similarly); dim tables (part, supplier,
nation, region, embeddings) stay single-copy, exactly like a larger
TPC-H SF keeps nation/region fixed. BENCH/PROBE USE ONLY — this is
not oracle data and lives under /tmp.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF03_DIR", "/tmp/spark_graft_sf03")

FACT_KEYS = {
    "lineitem": {"l_orderkey": "K_ORD"},
    "orders": {"o_orderkey": "K_ORD", "o_custkey": "K_CUST"},
    "customer": {"c_custkey": "K_CUST"},
    "events": {"event_id": "K_EVT", "user_id": "K_USR"},
    "documents": {"doc_id": "K_DOC"},
}
DIMS = ["part", "supplier", "nation", "region", "embeddings"]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    lims = {
        "K_ORD": con.execute(
            f"SELECT MAX(o_orderkey)+1 FROM read_parquet('{SRC}/orders.parquet')"
        ).fetchone()[0],
        "K_CUST": con.execute(
            f"SELECT MAX(c_custkey)+1 FROM read_parquet('{SRC}/customer.parquet')"
        ).fetchone()[0],
        "K_EVT": con.execute(
            f"SELECT MAX(event_id)+1 FROM read_parquet('{SRC}/events.parquet')"
        ).fetchone()[0],
        "K_USR": con.execute(
            f"SELECT MAX(user_id)+1 FROM read_parquet('{SRC}/events.parquet')"
        ).fetchone()[0],
        "K_DOC": con.execute(
            f"SELECT MAX(doc_id)+1 FROM read_parquet('{SRC}/documents.parquet')"
        ).fetchone()[0],
    }
    for t, keymap in FACT_KEYS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        parts = []
        for i in range(3):
            sel = ", ".join(
                f"{c} + {i * lims[keymap[c]]} AS {c}" if c in keymap else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet')")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: 3x written")
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    print(DST)


if __name__ == "__main__":
    main()
