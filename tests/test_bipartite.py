"""Bipartiteness + 2-coloring (algorithms/bipartite.py): matches a
brute-force BFS bipartition; odd cycles poison exactly their own
component; sides anchor at the component representative."""

from collections import deque

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.bipartite import bipartite_check

# component A: 6-cycle + pendant (bipartite), component B: triangle with
# a tail (odd — NOT bipartite), component C: single edge, D: isolated 40
EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (3, 6),
    (10, 11), (11, 12), (12, 10), (12, 13),
    (20, 21),
]
VERTS = sorted({v for e in EDGES for v in e} | {40})


def _brute(edges, verts):
    nbrs = {v: set() for v in verts}
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    comp, side, bip = {}, {}, {}
    for v in sorted(verts):
        if v in comp:
            continue
        # BFS from the minimum id of the component (visit order by id)
        members, par, ok = [], {v: 0}, True
        q = deque([v])
        while q:
            x = q.popleft()
            members.append(x)
            for y in nbrs[x]:
                if y not in par:
                    par[y] = 1 - par[x]
                    q.append(y)
                elif par[y] == par[x]:
                    ok = False
        for m in members:
            comp[m] = v
            bip[m] = 1 if ok else 0
            side[m] = par[m] if ok else None
    return comp, side, bip


@pytest.fixture(scope="module")
def result(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    verts = spark.createDataFrame([(v,) for v in VERTS], "id long")
    out, res = bipartite_check(edges, vertices=verts)
    rows = {r.id: r for r in out.collect()}
    return rows, res


class TestBipartite:
    def test_matches_bruteforce(self, result):
        rows, res = result
        comp, side, bip = _brute(EDGES, VERTS)
        assert set(rows) == set(VERTS)
        for v in VERTS:
            assert rows[v].component == comp[v], v
            assert rows[v].is_bipartite == bip[v], v
            assert rows[v].side == side[v], v
        assert res.converged

    def test_sides_anchor_at_representative(self, result):
        rows, _ = result
        # representative of each bipartite component has side 0
        assert rows[0].side == 0
        assert rows[20].side == 0 and rows[21].side == 1
        assert rows[40].side == 0 and rows[40].is_bipartite == 1

    def test_odd_component_all_null_sides(self, result):
        rows, _ = result
        for v in (10, 11, 12, 13):
            assert rows[v].is_bipartite == 0 and rows[v].side is None

    def test_partition_invariance(self, spark, result):
        rows, _ = result
        edges = spark.createDataFrame(EDGES, "src long, dst long").repartition(5)
        verts = spark.createDataFrame([(v,) for v in VERTS], "id long")
        out2, _ = bipartite_check(edges, vertices=verts)
        got2 = {(r.id, r.component, r.side, r.is_bipartite) for r in out2.collect()}
        want = {(r.id, r.component, r.side, r.is_bipartite) for r in rows.values()}
        assert got2 == want
