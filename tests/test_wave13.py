"""Wave-13 unit/property tests: sessionization boundary laws, Markov
transition conservation, skyline-vs-brute-force dominance, and
triangle counting against exhaustive enumeration (including the
degree-orientation invariance claim)."""

from itertools import combinations

from pyspark.sql import functions as F

from books2scrape_etl_spark.operators.graph import (
    copurchase_edges,
    triangle_corners,
    triangle_counts,
)
from books2scrape_etl_spark.operators.skyline import skyline_2d

# ---------------------------------------------------------------- sessions


def _sessionize(spark, rows, gap):
    """Run the sessionize window chain from query_defs13 on literal
    (user_id, event_id, event_type, es) rows."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, es long"
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    flagged = df.withColumn(
        "is_new",
        (
            F.lag("es").over(w).isNull() | (F.col("es") - F.lag("es").over(w) > gap)
        ).cast("bigint"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return {
        (r.user_id, r.event_id): r.session_id for r in sessions.collect()
    }


def test_sessionize_gap_boundary_is_strict(spark):
    # gaps of exactly `gap` stay in-session; gap+1 breaks
    rows = [
        (1, 1, "view", 1000),
        (1, 2, "view", 1000 + 300),      # same session
        (1, 3, "click", 1000 + 600),     # exactly gap from previous: same
        (1, 4, "view", 1000 + 901),      # gap+1 from previous: NEW session
        (2, 5, "view", 50),              # separate user restarts ids at 1
    ]
    sid = _sessionize(spark, rows, gap=300)
    assert sid[(1, 1)] == sid[(1, 2)] == sid[(1, 3)] == 1
    assert sid[(1, 4)] == 2
    assert sid[(2, 5)] == 1


def test_sessionize_tie_ordering_uses_event_id(spark):
    # two events at the same second: event_id orders them; both in one
    # session regardless of insertion order
    rows = [(1, 10, "a", 500), (1, 9, "b", 500), (1, 11, "c", 500 + 1000)]
    sid = _sessionize(spark, rows, gap=2000)
    assert sid[(1, 9)] == sid[(1, 10)] == sid[(1, 11)] == 1


def test_session_count_law_registry(spark, sf_dir):
    """Σ n_events over sessions == table row count, and session ids per
    user are dense 1..max (the running-sum construction's invariant)."""
    from books2scrape_etl_spark.io import read_table
    from books2scrape_etl_spark.queries import QUERIES

    out = QUERIES["sessionize_batch"](spark, sf_dir)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == read_table(spark, "events", sf_dir).count()
    dense = out.groupBy("user_id").agg(
        F.min("session_id").alias("mn"),
        F.max("session_id").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = dense.where((F.col("mn") != 1) | (F.col("mx") != F.col("n"))).count()
    assert bad == 0


def test_transitions_mass_conservation(spark, sf_dir):
    """Σ n over the transition matrix == rows - distinct users (every
    event except each user's first contributes exactly one edge)."""
    from books2scrape_etl_spark.io import read_table
    from books2scrape_etl_spark.queries import QUERIES

    out = QUERIES["event_transitions"](spark, sf_dir)
    got = out.agg(F.sum("n")).collect()[0][0]
    ev = read_table(spark, "events", sf_dir)
    expect = ev.count() - ev.select("user_id").distinct().count()
    assert got == expect


# ----------------------------------------------------------------- skyline


def _brute_skyline(points):
    """Reference dominance filter on (x, y) tuples: minimize x,
    maximize y, strict somewhere."""
    keep = []
    for p in points:
        dominated = any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in points
        )
        if not dominated:
            keep.append(p)
    return sorted(set(keep))


def test_skyline_matches_brute_force(spark):
    # deterministic pseudo-random cloud spanning several buckets,
    # including duplicate points and equal-x / equal-y collisions
    pts = [
        (float(900 + (i * 37) % 400) + (i % 3) * 0.25, 1 + (i * 53) % 50)
        for i in range(300)
    ]
    pts += [pts[10], pts[20], (900.0, 50), (900.0, 50)]  # dup frontier pt
    df = spark.createDataFrame(pts, "x double, y int")
    got = sorted(
        (r.x, r.y) for r in skyline_2d(df, "x", "y", bucket_width=100).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_counts_collapsed_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 10), (1.0, 10), (1.0, 3), (2.0, 9)], "x double, y int"
    )
    rows = {(r.x, r.y): r.n_rows for r in skyline_2d(df, "x", "y").collect()}
    # (1.0, 3) collapses under (1.0, 10) and joins its group count;
    # (2.0, 9) is dominated by (1.0, 10) and vanishes entirely
    assert rows == {(1.0, 10): 3}


def test_skyline_single_bucket_and_cross_bucket_dominance(spark):
    # cross-bucket: x=50 (bucket 0) with huge y dominates all of bucket 1
    df = spark.createDataFrame(
        [(50.0, 100), (150.0, 99), (150.5, 100), (250.0, 101)], "x double, y int"
    )
    got = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(50.0, 100), (250.0, 101)]


# --------------------------------------------------------------- triangles


def _edges_df(spark, edges):
    canon = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    return spark.createDataFrame(canon, "src long, dst long")


def _brute_triangles(edges):
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    nodes = sorted({n for e in canon for n in e})
    tri = []
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= canon:
            tri.append((a, b, c))
    return tri


def test_triangles_k4_and_per_node(spark):
    # K4 has 4 triangles; every node sits in 3
    k4 = [(u, v) for u, v in combinations(range(4), 2)]
    df = _edges_df(spark, k4)
    assert triangle_corners(df).count() == 4
    counts = {r.node: r.n_tri for r in triangle_counts(df).collect()}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_random_graphs_match_brute_force(spark):
    # a few deterministic pseudo-random graphs, incl. a skewed hub
    # (node 0 connected to everyone) — the case degree orientation
    # exists for: counts must still be exact
    for seed in (1, 2, 3):
        edges = {( (i * seed * 7) % 13, (i * seed * 11 + 3) % 13) for i in range(60)}
        edges |= {(0, v) for v in range(1, 13)}  # hub
        df = _edges_df(spark, edges)
        brute = _brute_triangles(edges)
        got = sorted(tuple(sorted((r.a, r.b, r.c))) for r in triangle_corners(df).collect())
        assert got == sorted(brute), f"seed={seed}"


def test_copurchase_edges_match_pair_join(spark, sf_dir):
    """HOF basket expansion == the relational distinct self-join."""
    from books2scrape_etl_spark.io import read_table

    li = read_table(spark, "lineitem", sf_dir)
    hof = copurchase_edges(li).select("src", "dst")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    ref = (
        a.join(b, "k")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    assert hof.exceptAll(ref).count() == 0
    assert ref.exceptAll(hof).count() == 0
