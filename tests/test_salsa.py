"""SALSA closed form (algorithms/salsa.py): hand-checked ratios,
per-component sides sum to 1, NULL for non-hubs/non-authorities,
brute-force double-cover parity on a random directed graph."""

import math
import random

from linkgraph.algorithms.salsa import salsa_scores

# hubs {1,2} share authority 10 -> one hub component; authorities
# {10,11} share citer 1 -> one authority component
SMALL = [(1, 10), (1, 11), (2, 10)]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _brute(edges):
    edges = sorted(set(edges))
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    outdeg, indeg = {}, {}
    for s, d in edges:
        union(2 * s, 2 * d + 1)
        outdeg[s] = outdeg.get(s, 0) + 1
        indeg[d] = indeg.get(d, 0) + 1
    hub_tot, auth_tot = {}, {}
    for u, od in outdeg.items():
        hub_tot[find(2 * u)] = hub_tot.get(find(2 * u), 0) + od
    for v, idg in indeg.items():
        auth_tot[find(2 * v + 1)] = auth_tot.get(find(2 * v + 1), 0) + idg
    verts = {x for e in edges for x in e}
    return {
        x: (
            outdeg[x] / hub_tot[find(2 * x)] if x in outdeg else None,
            indeg[x] / auth_tot[find(2 * x + 1)] if x in indeg else None,
        )
        for x in verts
    }


def _collect(spark, edges, **kw):
    out, res = salsa_scores(_df(spark, edges), **kw)
    assert res.converged
    return {r["id"]: (r["hub"], r["authority"]) for r in out.collect()}


class TestSalsa:
    def test_hand_ratios(self, spark):
        got = _collect(spark, SMALL)
        assert math.isclose(got[1][0], 2 / 3) and math.isclose(got[2][0], 1 / 3)
        assert math.isclose(got[10][1], 2 / 3) and math.isclose(got[11][1], 1 / 3)
        # pure hubs have NULL authority and vice versa
        assert got[1][1] is None and got[10][0] is None

    def test_components_isolate(self, spark):
        # second component {20->21, 22->21} must not mix with SMALL's
        got = _collect(spark, SMALL + [(20, 21), (22, 21)])
        assert math.isclose(got[20][0], 0.5) and math.isclose(got[22][0], 0.5)
        assert math.isclose(got[21][1], 1.0)
        assert math.isclose(got[1][0], 2 / 3)  # unchanged

    def test_self_loop(self, spark):
        got = _collect(spark, [(5, 5)])
        assert math.isclose(got[5][0], 1.0) and math.isclose(got[5][1], 1.0)

    def test_brute_force_parity(self, spark):
        rng = random.Random(13)
        edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(70)})
        exp = _brute(edges)
        got = _collect(spark, edges)
        assert set(got) == set(exp)
        for v in exp:
            for i in range(2):
                if exp[v][i] is None:
                    assert got[v][i] is None
                else:
                    assert math.isclose(got[v][i], exp[v][i])
