"""Landmark distance labeling (algorithms/landmarks.py): hand-checked
distances on a path, brute-force BFS parity on a random graph,
deterministic degree-based selection, depth bounding, and the
triangle-inequality estimate property."""

import random
from collections import deque

from linkgraph.algorithms.landmarks import landmark_distances, select_landmarks


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _bfs(adj, src, max_depth):
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        if dist[u] == max_depth:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _sym_adj(edges):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


class TestLandmarks:
    def test_path_graph(self, spark):
        # 0-1-2-3-4: top-degree landmarks are the interior vertices
        edges = [(i, i + 1) for i in range(4)]
        out, lms = landmark_distances(_df(spark, edges), num_landmarks=1)
        assert lms == [1]  # degree 2, lowest id among {1,2,3}
        got = {(r["id"], r["landmark"]): r["dist"] for r in out.collect()}
        assert got == {(0, 1): 1, (1, 1): 0, (2, 1): 1, (3, 1): 2, (4, 1): 3}

    def test_brute_force_parity(self, spark):
        rng = random.Random(5)
        edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
        edges = [(s, d) for s, d in edges if s != d]
        out, lms = landmark_distances(_df(spark, edges), num_landmarks=3, max_depth=10)
        adj = _sym_adj(edges)
        exp = {}
        for lm in lms:
            for v, d in _bfs(adj, lm, 10).items():
                exp[(v, lm)] = d
        got = {(r["id"], r["landmark"]): r["dist"] for r in out.collect()}
        assert got == exp

    def test_selection_deterministic(self, spark):
        edges = [(0, i) for i in range(1, 6)] + [(9, 8), (9, 7), (9, 6)]
        # degrees: 0 -> 5, 9 -> 3, everything else 1
        assert select_landmarks(_df(spark, edges), 2) == [0, 9]

    def test_depth_bound(self, spark):
        edges = [(i, i + 1) for i in range(6)]
        out, _ = landmark_distances(
            _df(spark, edges), landmarks=[0], max_depth=2
        )
        got = {r["id"]: r["dist"] for r in out.collect()}
        assert got == {0: 0, 1: 1, 2: 2}  # 3..6 beyond the hop bound

    def test_estimate_upper_bound(self, spark):
        rng = random.Random(13)
        edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
        edges = [(s, d) for s, d in edges if s != d]
        out, lms = landmark_distances(_df(spark, edges), num_landmarks=2, max_depth=12)
        lab = {}
        for r in out.collect():
            lab.setdefault(r["id"], {})[r["landmark"]] = r["dist"]
        adj = _sym_adj(edges)
        verts = sorted(adj)
        for u in verts[:6]:
            true = _bfs(adj, u, 12)
            for v in verts[:6]:
                if u == v or v not in true:
                    continue
                ests = [
                    lab[u][l] + lab[v][l]
                    for l in lms
                    if l in lab.get(u, {}) and l in lab.get(v, {})
                ]
                if ests:
                    assert min(ests) >= true[v]  # upper bound on distance
