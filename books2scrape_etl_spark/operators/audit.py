"""Data-quality constraint audit (the Deequ / dbt-test shape): declare
constraints, verify them in ONE aggregation pass over the table, get
back (check, metric, ok) rows.

Scale design: every constraint below compiles to a conditional
aggregate over the same scan — N constraints cost one table pass plus
one tiny shuffle of N partial aggregates, not N jobs (Deequ's core
trick, re-expressed in Catalyst). The referential check is the one
exception: it needs the dimension's key set, expressed as a left-anti
join that shuffles only the key column (or broadcasts, when the dim is
small enough — Catalyst/AQE decides).

The audit RESULT is plain rows, so the driver value-matches the whole
report — thresholds and all — rather than trusting a boolean exit
code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from books2scrape_etl_spark.functions.util import to_col

AUDIT_SCHEMA = "check_name string, metric bigint, ok boolean"


def null_count(col: Column | str) -> Column:
    return F.count(F.when(to_col(col).isNull(), 1))


def violation_count(pred: Column) -> Column:
    """Rows where the constraint predicate is FALSE or NULL (an
    unevaluable constraint is a violation, not a pass)."""
    return F.count(F.when(~F.coalesce(pred, F.lit(False)), 1))


def audit(
    df: DataFrame,
    completeness: list[str] | None = None,
    predicates: dict[str, Column] | None = None,
    unique: list[list[str]] | None = None,
    references: dict[str, tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Run the declared constraints; returns (check_name, metric, ok) rows.

    - ``completeness``: column names that must be non-null (metric =
      null count, ok = metric == 0);
    - ``predicates``: named boolean expressions that must hold on every
      row (metric = violation count, NULL counts as a violation);
    - ``unique``: key-column lists that must be unique (metric =
      duplicate-row count = COUNT(*) - COUNT(DISTINCT keys));
    - ``references``: name -> (dim_df, fact_key, dim_key): every fact
      key must exist in the dimension (metric = orphan count via
      left-anti join).

    Completeness + predicate + uniqueness checks share ONE aggregation
    over one scan; each referential check adds one anti-join whose
    shuffle carries only the key column.
    """
    aggs: list[Column] = []
    for c in completeness or []:
        aggs.append(null_count(c).alias(f"null:{c}"))
    for name, pred in (predicates or {}).items():
        aggs.append(violation_count(pred).alias(f"pred:{name}"))
    for keys in unique or []:
        label = "unique:" + ",".join(keys)
        # distinct over a STRUCT of the keys, not the bare columns:
        # count_distinct(a, b) silently drops rows where any key is
        # NULL (inflating the duplicate metric), while a struct with
        # NULL fields is itself non-null and counts as a value — the
        # semantics SQL's COUNT(DISTINCT (a, b)) uses.
        dupes = F.count(F.lit(1)) - F.count_distinct(
            F.struct(*[to_col(k) for k in keys])
        )
        aggs.append(dupes.alias(label))
    sections: list[DataFrame] = []
    if aggs:
        wide = df.agg(*aggs)
        stacked = wide.select(
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(c) for c in wide.columns]),
                    F.array(*[F.col(f"`{c}`").cast("long") for c in wide.columns]),
                )
            ).alias("check_name", "metric")
        )
        sections.append(stacked)
    for name, (dim, fact_key, dim_key) in (references or {}).items():
        orphans = df.select(to_col(fact_key).alias("__fk")).join(
            dim.select(to_col(dim_key).alias("__fk")), "__fk", "left_anti"
        )
        sections.append(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("metric")).select(
                F.lit(f"ref:{name}").alias("check_name"), "metric"
            )
        )
    if not sections:
        raise ValueError("audit() called with no constraints declared")
    out = sections[0]
    for s in sections[1:]:
        out = out.union(s)
    return out.select("check_name", "metric", (F.col("metric") == 0).alias("ok"))
