"""Graph analytics over relationship edges (SURVEY §2 L-family
extension): PageRank and degree statistics on the customer→supplier
purchase graph.

PageRank complements the connected-components operators in
:mod:`operators.dedupe`: CC is iterative LABEL propagation (exact,
converges by reachability), PageRank is iterative FLOAT propagation
(fixed iteration count, converges numerically). Both share the
scale discipline:

- per-iteration work is one equi-join (edges × ranks on src) and one
  groupBy(dst) — partial aggregation collapses contributions
  map-side, so the shuffle carries (dst, partial_sum) pairs, never
  the edge list;
- out-degrees are computed once and reused every iteration;
- lineage is cut with ``localCheckpoint`` every round by default:
  the dangling-mass scalar forces one action per round anyway, so
  materializing ranks first makes that action a scan instead of a
  full lineage replay (measured 2x on the purchase graph); nodes and
  out-degrees checkpoint once up front since every round reuses them;
- the dangling-node mass (rank parked on nodes with no out-edges) is
  a 1-row aggregate collected per iteration — one scalar per round,
  the same budget as CC's convergence fingerprint.

Determinism note: float addition is not associative, so rank values
may differ in the last ulps across partitionings. Invariants that are
stable — rank sums to 1, every rank positive, fixed point close to a
NumPy reference — are what the tests and the driver invariant row
pin; bit-identity is deliberately NOT claimed (unlike the integer
label propagation of CC, which is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, pr) after ``iterations`` synchronous PageRank rounds with
    teleport ``1-damping`` and classic dangling-mass redistribution.
    Node set = every id appearing on either edge side; parallel edges
    count as weight (a multi-edge contributes once per occurrence)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    ranks = nodes.withColumn("pr", F.lit(1.0 / n)).localCheckpoint(eager=False)
    for i in range(iterations):
        contribs = (
            edges.select(F.col(src).alias("node"), F.col(dst).alias("to"))
            .join(ranks, "node")
            .join(out_deg, "node")
            .select("to", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy(F.col("to").alias("node"))
            .agg(F.sum("c").alias("in_sum"))
        )
        dangling = (
            ranks.join(out_deg, "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def purchase_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Directed customer→supplier edges from the fact: one edge per
    distinct (customer, supplier) purchase relation. Suppliers map to
    ``-(suppkey + 1)`` — strictly negative even for 0-based key spaces
    (a bare negation parks supplier 0 on node 0, colliding with
    customer 0 and silently merging the two id spaces)."""
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            (-(F.col("l_suppkey") + 1)).alias("dst"),
        )
        .distinct()
    )
