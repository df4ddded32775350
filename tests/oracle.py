"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a Spark query and its oracle SQL on the same parquet, compares
row count, column names, and order-insensitive values. Floats compare
exactly by design (the engine's aggregates are exact-decimal-backed);
a tiny tolerance is kept as a diagnostic so a failure says *how far*.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(df):
    # sort columns by name, then rows by every column (stringified for
    # stable cross-type ordering), like an order-insensitive hash would.
    df = df[sorted(df.columns)].copy()
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    df = df.iloc[key.argsort(kind="mergesort").values].reset_index(drop=True)
    return df


def compare(spark_df, oracle_df, rel_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s = spark_df.toPandas()
    o = oracle_df
    if len(s) != len(o):
        problems.append(f"row count: spark={len(s)} oracle={len(o)}")
    if sorted(s.columns) != sorted(o.columns):
        problems.append(f"columns: spark={sorted(s.columns)} oracle={sorted(o.columns)}")
        return problems
    if problems:
        return problems
    s, o = _normalize(s), _normalize(o)
    for col in s.columns:
        sv, ov = s[col].values, o[col].values
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None or (isinstance(a, float) and math.isnan(a)):
                ok = b is None or (isinstance(b, float) and math.isnan(b))
            elif isinstance(a, float) and isinstance(b, float):
                ok = a == b or (
                    rel_tol > 0 and abs(a - b) <= rel_tol * max(abs(a), abs(b))
                )
            else:
                ok = str(a) == str(b)
            if not ok:
                problems.append(f"{col}[{i}]: spark={a!r} oracle={b!r}")
                if len(problems) > 5:
                    return problems
    return problems
