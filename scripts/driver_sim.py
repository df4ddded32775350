"""Driver simulation (verify skill recipe): vanilla session, /tmp cwd,
sf0.01 — entry smoke + every oracle-paired qname vs DuckDB, rows-only
qnames counted. Mirrors the driver's CORRECTNESS check."""

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402

SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
LIMIT = int(os.environ.get("SIM_LIMIT", "0"))  # 0 = all
ONLY = [n for n in os.environ.get("SIM_ONLY", "").split(",") if n]  # subset filter
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    df = df[sorted(df.columns)].copy()
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    return df.iloc[key.argsort(kind="mergesort").values].reset_index(drop=True)


def values_match(s, o):
    for col in s.columns:
        for a, b in zip(s[col].values, o[col].values):
            a_nan = a is None or (isinstance(a, float) and math.isnan(a))
            b_nan = b is None or (isinstance(b, float) and math.isnan(b))
            if a_nan or b_nan:
                if a_nan != b_nan:
                    return f"{col}: {a!r} vs {b!r}"
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b:
                    return f"{col}: {a!r} vs {b!r}"
            elif str(a) != str(b):
                return f"{col}: {a!r} vs {b!r}"
    return None


def main():
    from pyspark.sql import SparkSession

    assert os.getcwd() != "/root/repo", "run from outside the repo"
    builder = SparkSession.builder.master("local[8]")
    # SIM_CONF="k=v;k=v" — robustness probes (e.g. AQE off, adversarial
    # shuffle partition counts) to prove values never depend on the
    # runtime planner or the partitioning. Default stays vanilla (the
    # driver's own session shape).
    for kv in filter(None, os.environ.get("SIM_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()

    t0 = time.time()
    df = e.entry(spark)
    rows = df.collect()
    print(f"entry: {len(rows)} rows {df.schema.simpleString()[:80]} "
          f"({time.time()-t0:.1f}s)", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    names = list(qs)
    if ONLY:
        names = [n for n in names if n in ONLY]
    if LIMIT:
        names = names[:LIMIT]
    n_pass = n_fail = n_rowsonly = 0
    for i, name in enumerate(names):
        # Hermetic per-qname run: several operators persist
        # intermediates (minhash shingle/band frames, check-branch
        # reuse) that a single qname run sizes for; across 297 qnames
        # in ONE local-mode JVM the leaked storage blocks accumulate
        # in the same heap that builds broadcast tables, and the sweep
        # eventually dies with "Not enough memory to build and
        # broadcast" on whatever qname runs late (measured r9c3:
        # graph_triangles at sf0.1, position 222 — green solo in 14 s).
        # The driver's own CORRECTNESS harness runs ~50 qnames and
        # never gets there; the full-registry sweep does.
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}"[:300], flush=True)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {i:2d} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)", flush=True)
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {ex}"[:300], flush=True)
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}", flush=True)
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: cols {sorted(sdf.columns)} vs {sorted(odf.columns)}", flush=True)
            n_fail += 1
            continue
        diff = values_match(normalize(sdf), normalize(odf))
        if diff:
            print(f"FAIL {name}: value {diff}"[:300], flush=True)
            n_fail += 1
        else:
            print(f"ok   {i:2d} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)", flush=True)
            n_pass += 1
    print(json.dumps({"pass": n_pass, "fail": n_fail, "rows_only": n_rowsonly}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
