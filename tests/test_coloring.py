"""Jones-Plassmann greedy coloring (algorithms/coloring.py): the
result is a proper coloring in both coin modes; portable mode matches
a hashlib-recomputed brute-force round simulation exactly."""

import hashlib

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.coloring import greedy_coloring

SEED = 7

# two triangles bridged by a path, a 4-cycle, a pendant edge, and a
# star around 30 (same family of shapes as test_mis.py)
EDGES = [
    (0, 1), (1, 2), (2, 0),
    (2, 3), (3, 4),
    (4, 5), (5, 6), (6, 4),
    (10, 11), (11, 12), (12, 13), (13, 10),
    (30, 31), (30, 32), (30, 33), (30, 34),
    (20, 21),
]


def _coin(v: int, k: int, seed: int) -> int:
    return int(
        hashlib.md5(f"color:{v}:{k}:{seed}".encode()).hexdigest()[:6], 16
    )


def _brute_coloring(edges, seed, vertices=()):
    nbrs = {v: set() for v in vertices}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    live = set(nbrs)
    color = {}
    k = 0
    while live:
        k += 1
        coins = {v: _coin(v, k, seed) for v in live}
        won = {
            v
            for v in live
            if all(coins[v] < coins[u] for u in nbrs[v] if u in live)
        }
        # simultaneous choice: mex over the PRE-round colored snapshot
        snapshot = dict(color)
        for v in won:
            used = {snapshot[u] for u in nbrs[v] if u in snapshot}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        live -= won
    return color, k


def _assert_proper(edges, color: dict):
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    for s, d in edges:
        assert color[s] != color[d], f"edge ({s},{d}) monochromatic"
    for v, c in color.items():
        assert 0 <= c <= len(nbrs.get(v, ())), f"{v} color {c} > deg"


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long").cache()


class TestColoring:
    def test_portable_matches_bruteforce(self, edges_df):
        out, res = greedy_coloring(edges_df, seed=SEED, portable=True)
        got = {r.id: r.color for r in out.collect()}
        want, rounds = _brute_coloring(EDGES, SEED)
        assert got == want
        assert res.converged and res.supersteps == rounds
        _assert_proper(EDGES, got)

    def test_production_mode_proper_and_partition_invariant(self, edges_df):
        a, res = greedy_coloring(edges_df, seed=SEED)
        got_a = {r.id: r.color for r in a.collect()}
        _assert_proper(EDGES, got_a)
        assert res.converged
        b, _ = greedy_coloring(edges_df.repartition(5), seed=SEED)
        assert got_a == {r.id: r.color for r in b.collect()}

    def test_isolated_vertex_colors_zero(self, spark):
        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        verts = spark.createDataFrame([(1,), (2,), (40,)], "id long")
        out, _ = greedy_coloring(df, seed=SEED, vertices=verts)
        got = {r.id: r.color for r in out.collect()}
        assert got[40] == 0
        assert sorted((got[1], got[2])) == [0, 1]

    def test_star_uses_two_colors(self, spark):
        # a star is bipartite: center one color, every leaf the other;
        # greedy JP always achieves exactly {0, 1} on it
        star = [(100, 100 + i) for i in range(1, 9)]
        df = spark.createDataFrame(star, "src long, dst long")
        out, _ = greedy_coloring(df, seed=SEED)
        got = {r.id: r.color for r in out.collect()}
        _assert_proper(star, got)
        assert set(got.values()) == {0, 1}
        leaves = {c for v, c in got.items() if v != 100}
        assert len(leaves) == 1

    def test_odd_cycle_three_colors(self, spark):
        n = 9
        cyc = [(i, (i + 1) % n) for i in range(n)]
        df = spark.createDataFrame(cyc, "src long, dst long")
        out, _ = greedy_coloring(df, seed=SEED)
        got = {r.id: r.color for r in out.collect()}
        _assert_proper(cyc, got)
        assert max(got.values()) <= 2  # JP on a cycle: at most 3 colors
