"""Maximal matching (algorithms/matching.py): validity (a matching),
maximality (no live edge left), exact parity with a Python simulator
of the identical coin rule, and isolated-vertex handling."""

import random

from linkgraph.algorithms.matching import maximal_matching
from linkgraph.phash import md5_int


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _canon(edges):
    s = set()
    for a, b in edges:
        if a != b:
            s.add((min(a, b), max(a, b)))
    return sorted(s)


def _simulate(edges, seed, max_rounds=60):
    """The exact engine rule: per round, live edges draw the portable
    md5 coin; each live vertex points at its lexicographically
    smallest incident live edge by (coin, u, v); an edge matches when
    BOTH endpoints point at it."""
    canon = _canon(edges)
    verts = sorted({v for e in canon for v in e} | {v for e in edges for v in e})
    mate = {v: -1 for v in verts}
    for k in range(1, max_rounds + 1):
        le = [(u, v) for u, v in canon if mate[u] == -1 and mate[v] == -1]
        if not le:
            break
        coin = {e: md5_int(f"mm:{e[0]}:{e[1]}:{k}:{seed}") for e in le}
        argmin = {}
        for u, v in le:
            key = (coin[(u, v)], u, v)
            for vid in (u, v):
                if vid not in argmin or key < argmin[vid]:
                    argmin[vid] = key
        for u, v in le:
            key = (coin[(u, v)], u, v)
            if argmin[u] == key and argmin[v] == key:
                mate[u], mate[v] = v, u
    return mate


def _assert_valid_maximal(out, edges):
    canon = _canon(edges)
    for v, m in out.items():
        if m != -1:
            assert out[m] == v, f"asymmetric mate {v}<->{m}"
            assert (min(v, m), max(v, m)) in set(canon), "mate is not an edge"
    for u, v in canon:
        assert out[u] != -1 or out[v] != -1, f"live edge {(u, v)} left unmatched"


class TestMaximalMatching:
    def test_simulator_parity_portable(self, spark):
        rng = random.Random(7)
        edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(140)})
        out_df, res = maximal_matching(_df(spark, edges), seed=5, portable=True)
        out = {r["id"]: r["mate"] for r in out_df.collect()}
        assert res.converged
        assert out == _simulate(edges, seed=5)
        _assert_valid_maximal(out, edges)

    def test_production_mode_valid_maximal(self, spark):
        rng = random.Random(11)
        edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(200)})
        out_df, res = maximal_matching(_df(spark, edges), seed=1, portable=False)
        out = {r["id"]: r["mate"] for r in out_df.collect()}
        assert res.converged
        _assert_valid_maximal(out, edges)

    def test_isolated_and_selfloop(self, spark):
        verts = spark.createDataFrame([(i,) for i in range(6)], "id long")
        edges = [(0, 1), (2, 2)]  # 2 has only a self-loop: never matches
        out_df, res = maximal_matching(
            _df(spark, edges), vertices=verts, portable=True
        )
        out = {r["id"]: r["mate"] for r in out_df.collect()}
        assert res.converged
        assert out[0] == 1 and out[1] == 0
        for v in (2, 3, 4, 5):
            assert out[v] == -1
        assert len(out) == 6
