"""Evidence-packing suite helpers (shared by query_defs33/35).

A packing suite turns N already-registered single-operator qnames into
ONE driver window slot: each section re-runs the single's registered
Spark callable and wraps the single's registered oracle SQL verbatim,
so both sides stay definitionally in sync with the standalone qnames.
On top of that, BOTH the Spark projection and the oracle projection
are generated from ONE slot-mapping table per section — the
normalization itself cannot desync.

Normalized schema per suite: ``sec`` (section = the single's qname)
plus string slots s1.., BIGINT slots n1.., DOUBLE slots d1.. — unused
slots NULL of the right type. Doubles pass through unchanged (they
are hash-safe in the singles by construction); narrower ints are cast
to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from books2scrape_etl_spark.registry import ORACLE_SQL, QUERIES

_SQL_T = {"string": "VARCHAR", "bigint": "BIGINT", "double": "DOUBLE"}


def width(n_s: int, n_n: int, n_d: int) -> list[tuple[str, str]]:
    return (
        [(f"s{i}", "string") for i in range(1, n_s + 1)]
        + [(f"n{i}", "bigint") for i in range(1, n_n + 1)]
        + [(f"d{i}", "double") for i in range(1, n_d + 1)]
    )


def sect_df(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    width: list[tuple[str, str]],
    slots: dict[str, str],
) -> DataFrame:
    df = QUERIES[name](spark, sf_dir)
    cols = [F.lit(name).alias("sec")]
    for slot, typ in width:
        src = slots.get(slot)
        if src is None:
            cols.append(F.lit(None).cast(typ).alias(slot))
        else:
            cols.append(F.col(src).cast(typ).alias(slot))
    return df.select(*cols)


def sect_sql(name: str, width: list[tuple[str, str]], slots: dict[str, str]) -> str:
    # Sources are qualified as sub_{name}.{src} (ADVICE r8): the SELECT
    # list also defines same-named aliases (e.g. a slot mapping n3 from
    # source column n1 after `CAST(...) AS n1`), and unqualified refs
    # would make correctness depend on DuckDB preferring base columns
    # over lateral aliases. Qualification removes the ambiguity.
    parts = [f"'{name}' AS sec"]
    for slot, typ in width:
        src = slots.get(slot)
        ref = "NULL" if src is None else f"sub_{name}.{src}"
        parts.append(f"CAST({ref} AS {_SQL_T[typ]}) AS {slot}")
    return f"SELECT {', '.join(parts)} FROM ({ORACLE_SQL[name]}) sub_{name}"


def suite_sql(width: list[tuple[str, str]], sections: dict[str, dict[str, str]]) -> str:
    return "\nUNION ALL\n".join(sect_sql(n, width, m) for n, m in sections.items())


def suite_df(
    spark: SparkSession,
    sf_dir: str,
    width: list[tuple[str, str]],
    sections: dict[str, dict[str, str]],
) -> DataFrame:
    out = None
    for name, mapping in sections.items():
        part = sect_df(spark, sf_dir, name, width, mapping)
        out = part if out is None else out.union(part)
    return out
