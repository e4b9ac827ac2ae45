"""Rectangle (4-cycle) counting (algorithms/rectangles.py):
hand-checked motifs, brute-force parity on a random graph, zero-fill
over the vertex universe, and the exact center-degree cap."""

import random
from itertools import combinations

from linkgraph.algorithms.rectangles import rectangle_counts

SQUARE = [(0, 1), (1, 2), (2, 3), (3, 0)]
K4 = [(a, b) for a, b in combinations(range(4), 2)]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _brute(edges, n):
    """Per-vertex 4-cycle counts by enumerating opposite pairs."""
    adj = {v: set() for v in range(n)}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    rect = {v: 0 for v in adj}
    for u, v in combinations(sorted(adj), 2):
        c = len(adj[u] & adj[v])
        pr = c * (c - 1) // 2
        rect[u] += pr
        rect[v] += pr
    return rect


class TestRectangles:
    def test_square(self, spark):
        got = {r["id"]: r["rect"] for r in rectangle_counts(_df(spark, SQUARE)).collect()}
        assert got == {0: 1, 1: 1, 2: 1, 3: 1}

    def test_k4(self, spark):
        # K4 holds 3 distinct 4-cycles; every vertex sits on all 3
        got = {r["id"]: r["rect"] for r in rectangle_counts(_df(spark, K4)).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_triangle_has_none(self, spark):
        got = {r["id"]: r["rect"] for r in rectangle_counts(
            _df(spark, [(0, 1), (1, 2), (2, 0)])).collect()}
        assert got == {0: 0, 1: 0, 2: 0}

    def test_brute_force_parity(self, spark):
        rng = random.Random(11)
        edges = list({(rng.randrange(24), rng.randrange(24)) for _ in range(140)})
        edges = [(s, d) for s, d in edges if s != d]
        exp = _brute(edges, 24)
        got = {r["id"]: r["rect"] for r in rectangle_counts(_df(spark, edges)).collect()}
        assert got == {v: c for v, c in exp.items() if v in got}
        # vertex universe = endpoints of edges, zero-filled
        touched = {s for s, _ in edges} | {d for _, d in edges}
        assert set(got) == touched

    def test_center_degree_cap_exact(self, spark):
        # hub 99 adjacent to 0..9; 0-1 also adjacent: rectangles through
        # the hub disappear when the cap excludes it as a CENTER, but the
        # hub still counts rectangles it sits ON as an endpoint.
        edges = [(99, i) for i in range(10)] + [(0, 1), (2, 3), (0, 2), (1, 3)]
        capped = {r["id"]: r["rect"] for r in rectangle_counts(
            _df(spark, edges), max_center_degree=9).collect()}
        full = {r["id"]: r["rect"] for r in rectangle_counts(
            _df(spark, edges), max_center_degree=None).collect()}
        brute = _brute(edges, 100)
        assert full == {v: c for v, c in brute.items() if v in full}
        # capping center 99 removes exactly the wedges centered on it:
        # recompute brute force without 99 as a middle vertex
        adj = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        rect = {v: 0 for v in adj}
        for u, v in combinations(sorted(adj), 2):
            c = len((adj[u] & adj[v]) - {99})
            pr = c * (c - 1) // 2
            rect[u] += pr
            rect[v] += pr
        assert capped == {v: c for v, c in rect.items() if v in capped}
