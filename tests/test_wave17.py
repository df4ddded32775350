"""Wave-17 unit/property tests: two-phase top-k == window-form top-k
(the helper's core law, on an adversarial random shape), moving-average
trend laws (flat series => zero residual; frame-edge averaging), and
Lorenz/Gini laws (shares monotone to 1.0; Gini equals the pandas
re-derivation; uniform spend => Gini ~ 0)."""

import math
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from books2scrape_etl_spark.operators.scale import topk_per_group_scale
from books2scrape_etl_spark.query_defs17 import (
    _TOPK_K,
    q_lorenz_deciles,
    q_topk_groups_scale,
    q_ts_trend,
)

# ------------------------------------------------------ topk_per_group_scale


def test_topk_scale_equals_window_form_random_shape(spark):
    df = spark.range(0, 4003).select(
        (F.col("id") % 11).alias("g"),
        ((F.col("id") * 2654435761) % 97).alias("v"),  # heavy ties
        F.col("id").alias("tie"),
    )
    got = topk_per_group_scale(df, ["g"], ["v", "tie"], 7).collect()
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("tie").desc())
    exp = (
        df.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 7)
        .select("g", "rank", "v", "tie")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_topk_groups_rankings_are_strictly_ordered(spark, sf_dir):
    rows = q_topk_groups_scale(spark, sf_dir).collect()
    by_g = defaultdict(list)
    for r in rows:
        by_g[r["event_type"]].append(r)
    for g, rs in by_g.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _TOPK_K
        keys = [(r["cents"], r["user_id"]) for r in rs]
        assert keys == sorted(keys, reverse=True)


# ----------------------------------------------------------------- ts_trend


def test_trend_matches_pandas_rolling(spark, sf_dir):
    rows = q_ts_trend(spark, sf_dir).collect()
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["day"] = ev["ts"].astype("int64") // 10**6 // 86400
    counts = ev.groupby(["event_type", "day"]).size()
    by_type = defaultdict(dict)
    for (g, d), n in counts.items():
        by_type[g][d] = n
    for r in rows:
        days = sorted(by_type[r["event_type"]])
        i = days.index(r["day"])
        frame = days[max(0, i - 3) : i + 4]
        ns = [by_type[r["event_type"]][d] for d in frame]
        assert r["n"] == by_type[r["event_type"]][r["day"]]
        assert math.isclose(r["trend"], sum(ns) / len(ns), rel_tol=1e-12)
        assert math.isclose(
            r["residual"], r["n"] - sum(ns) / len(ns), rel_tol=1e-9, abs_tol=1e-12
        )


def test_trend_flat_series_has_zero_residual(spark):
    import pandas as pd

    pdf = pd.DataFrame({"event_type": ["x"] * 20, "day": range(20), "n": [4] * 20})
    d = spark.createDataFrame(pdf)
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    out = d.select(
        "day",
        (
            F.col("n").cast("double")
            - F.sum("n").over(w).cast("double") / F.count(F.lit(1)).over(w).cast("double")
        ).alias("resid"),
    ).collect()
    assert all(r["resid"] == 0.0 for r in out)


# ------------------------------------------------------------ lorenz_deciles


def test_lorenz_shares_monotone_and_gini_matches_pandas(spark, sf_dir):
    rows = sorted(q_lorenz_deciles(spark, sf_dir).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cs = [r["cust_share"] for r in rows]
    ss = [r["spend_share"] for r in rows]
    assert cs == sorted(cs) and ss == sorted(ss)
    assert math.isclose(cs[-1], 1.0) and math.isclose(ss[-1], 1.0)
    # Lorenz curve lies below the diagonal (spend is concentrated)
    assert all(s <= c + 1e-12 for c, s in zip(cs, ss))

    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cents = (
        orders.assign(c=orders["o_totalprice"].round(2).mul(100).round().astype("int64"))
        .groupby("o_custkey")["c"]
        .sum()
        .sort_values(kind="stable")
        .values
    )
    n = len(cents)
    ranks = np.arange(1, n + 1)
    gini = 2 * float((ranks * cents).sum()) / (n * float(cents.sum())) - (n + 1) / n
    assert math.isclose(rows[0]["gini"], gini, rel_tol=1e-9)


def test_gini_uniform_spend_is_zero(spark):
    # direct law on the formula: equal x_i => G = 0 exactly
    n = 100
    ranks = np.arange(1, n + 1)
    x = np.full(n, 7)
    g = 2 * float((ranks * x).sum()) / (n * float(x.sum())) - (n + 1) / n
    assert abs(g) < 1e-12
