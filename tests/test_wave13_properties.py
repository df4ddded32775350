"""Property tests for the wave-13 operators — pure-python replays of
each algorithmic law (the wave-12 pattern: the Spark form is pinned by
unit tests + the oracle sim; these pin the MATH on random inputs).

- sessionization: the lag→flag→running-sum construction equals direct
  segmentation of the sorted event list, for any gap and any input
  order (the construction only reads the sorted order);
- skyline: the bucketed two-level prefix-max decomposition equals
  brute-force dominance filtering, for any bucket width;
- triangles: degree-oriented wedge enumeration equals exhaustive
  triangle listing, and every triangle is found at exactly one corner
  (the uniqueness argument the Spark join relies on).
"""

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------------------- sessions


def _sessionize_construction(events, gap):
    """Replay of query_defs13's window chain: sort by (es, event_id),
    flag gap breaks, running-sum the flags into session ids."""
    out = {}
    sid = 0
    prev = None
    for es, eid in sorted(events):
        if prev is None or es - prev > gap:
            sid += 1
        out[eid] = sid
        prev = es
    return out


def _sessionize_reference(events, gap):
    """Independent formulation: split the sorted list wherever the gap
    exceeds the threshold; number the segments 1..k."""
    ordered = sorted(events)
    segments = [[ordered[0]]] if ordered else []
    for a, b in zip(ordered, ordered[1:]):
        if b[0] - a[0] > gap:
            segments.append([])
        segments[-1].append(b)
    return {eid: i + 1 for i, seg in enumerate(segments) for _, eid in seg}


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_sessionize_construction_matches_segmentation(data):
    gap = data.draw(st.integers(0, 50))
    times = data.draw(st.lists(st.integers(0, 300), min_size=1, max_size=40))
    events = [(t, i) for i, t in enumerate(times)]  # event_id breaks ties
    got = _sessionize_construction(events, gap)
    ref = _sessionize_reference(events, gap)
    assert got == ref
    # dense ids 1..k and monotone along the sorted order
    ids = [got[eid] for _, eid in sorted(events)]
    assert ids[0] == 1
    assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))


# -------------------------------------------------------------- skyline


def _skyline_two_level(points, width):
    """Replay of operators/skyline.py: per-x max, within-bucket prefix
    max over strictly-smaller x, cross-bucket prefix max of bucket
    maxima over strictly-lower buckets."""
    cand = {}
    for x, y in points:
        cand[x] = max(cand.get(x, y), y)
    bucket_of = lambda x: x - x % width
    bmax = {}
    for x, y in cand.items():
        b = bucket_of(x)
        bmax[b] = max(bmax.get(b, y), y)
    prefix = {}
    acc = None
    for b in sorted(bmax):
        prefix[b] = acc
        acc = bmax[b] if acc is None else max(acc, bmax[b])
    keep = []
    for x, y in cand.items():
        b = bucket_of(x)
        local = [cand[x2] for x2 in cand if bucket_of(x2) == b and x2 < x]
        lm = max(local) if local else None
        pm = prefix[b]
        if (lm is None or y > lm) and (pm is None or y > pm):
            keep.append((x, y))
    return sorted(keep)


def _skyline_brute(points):
    pts = set(points)
    return sorted(
        {
            (x, y)
            for x, y in pts
            if not any(
                qx <= x and qy >= y and (qx < x or qy > y) for qx, qy in pts
            )
        }
    )


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_skyline_decomposition_matches_brute_force(data):
    width = data.draw(st.integers(1, 17))
    points = data.draw(
        st.lists(
            st.tuples(st.integers(0, 60), st.integers(-20, 20)),
            min_size=1,
            max_size=50,
        )
    )
    assert _skyline_two_level(points, width) == _skyline_brute(points)


# ------------------------------------------------------------ triangles


def _oriented_wedge_triangles(edges):
    """Replay of operators/graph.py:triangle_corners — orient each
    edge from its lower-(degree, id) endpoint, pair out-neighbors,
    close against the canonical edge set. Returns the list of
    (a, b, c) rows AS ENUMERATED (duplicates would indicate
    double-counting)."""
    canon = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    deg = {}
    for u, v in canon:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    out = {}
    for u, v in canon:
        lo = u if (deg[u], u) < (deg[v], v) else v
        hi = v if lo == u else u
        out.setdefault(lo, []).append(hi)
    tri = []
    for a, nbrs in out.items():
        for b, c in combinations(sorted(nbrs), 2):
            if (b, c) in canon:
                tri.append((a, b, c))
    return tri, canon


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0,
        max_size=45,
    )
)
def test_oriented_enumeration_equals_exhaustive(edges):
    tri, canon = _oriented_wedge_triangles(edges)
    nodes = sorted({n for e in canon for n in e})
    brute = [
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if {(a, b), (a, c), (b, c)} <= canon
    ]
    # exactly-once enumeration: same SET and same COUNT (no dup rows)
    assert sorted(tuple(sorted(t)) for t in tri) == brute
    assert len(tri) == len(brute)
