"""Core decomposition (algorithms/coreness.py): the h-index fixpoint
matches classic minimum-degree peeling exactly."""

import random
from collections import defaultdict

from linkgraph.algorithms.coreness import core_decomposition


def _peel_coreness(edges):
    """Classic exact peeling: repeatedly remove the minimum-degree
    vertex; its coreness is the max degree-at-removal seen so far."""
    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    core = {}
    cur = 0
    alive = set(deg)
    while alive:
        v = min(alive, key=lambda u: deg[u])
        cur = max(cur, deg[v])
        core[v] = cur
        alive.remove(v)
        for u in nbrs[v]:
            if u in alive:
                deg[u] -= 1
    return core


class TestCoreness:
    def test_matches_peeling_random(self, spark):
        rng = random.Random(13)
        edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
        e = spark.createDataFrame(edges, "src long, dst long")
        out, res = core_decomposition(e)
        assert res.converged
        got = {r["id"]: r["coreness"] for r in out.collect()}
        want = _peel_coreness(edges)
        for v, k in want.items():
            assert got[v] == k, (v, got[v], k)

    def test_clique_plus_tail(self, spark):
        # K4 on {0..3} (coreness 3) + path 3-10-11 (tail coreness 1)
        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 10), (10, 11)]
        e = spark.createDataFrame(edges, "src long, dst long")
        out, res = core_decomposition(e)
        assert res.converged
        got = {r["id"]: r["coreness"] for r in out.collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1}

    def test_isolated_vertex_zero(self, spark):
        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        v = spark.createDataFrame([(0,), (1,), (99,)], "id long")
        out, _ = core_decomposition(e, vertices=v)
        got = {r["id"]: r["coreness"] for r in out.collect()}
        assert got == {0: 1, 1: 1, 99: 0}

    def test_truncation_flag(self, spark):
        # two triangles joined through vertex 3: degree init overshoots
        # (deg(2) = deg(4) = 3 vs coreness 2), so one round cannot reach
        # the fixpoint
        edges2 = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
        e2 = spark.createDataFrame(edges2, "src long, dst long")
        out2, res2 = core_decomposition(e2, max_iters=1)
        assert not res2.converged
