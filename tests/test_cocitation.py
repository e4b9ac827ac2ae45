"""Co-citation / bibliographic coupling (algorithms/cocitation.py):
hand-checked counts, brute-force parity on a random directed graph,
min_common pruning, and the exact center-degree cap."""

import math
import random
from itertools import combinations

from linkgraph.algorithms.cocitation import bibliographic_coupling, cocitation

# 1->{10,11,12}, 2->{10,11}, 3->{11,12}
SMALL = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 11), (3, 12)]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _brute(edges, by):
    """by='in': shared citers of (u,v); by='out': shared targets."""
    ins, outs = {}, {}
    for s, d in set(edges):
        outs.setdefault(s, set()).add(d)
        ins.setdefault(d, set()).add(s)
    sets = ins if by == "in" else outs
    out = {}
    for u, v in combinations(sorted(sets), 2):
        c = len(sets[u] & sets[v])
        if c:
            out[(u, v)] = (c, c / math.sqrt(len(sets[u]) * len(sets[v])))
    return out


class TestCocitation:
    def test_hand_counts(self, spark):
        got = {
            (r["u"], r["v"]): (r["common"], r["cosine"])
            for r in cocitation(_df(spark, SMALL)).collect()
        }
        # (10,11): citers {1,2}; (11,12): citers {1,3}; (10,12) has 1 < min_common
        assert set(got) == {(10, 11), (11, 12)}
        assert got[(10, 11)][0] == 2 and got[(11, 12)][0] == 2
        assert math.isclose(got[(10, 11)][1], 2 / math.sqrt(2 * 3))

    def test_brute_force_parity(self, spark):
        rng = random.Random(7)
        edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(160)})
        edges = [(s, d) for s, d in edges if s != d]
        exp = {
            k: v for k, v in _brute(edges, "in").items() if v[0] >= 2
        }
        got = {
            (r["u"], r["v"]): (r["common"], r["cosine"])
            for r in cocitation(_df(spark, edges)).collect()
        }
        assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in exp.items()}
        for k in exp:
            assert math.isclose(got[k][1], exp[k][1])

    def test_coupling_brute_force(self, spark):
        rng = random.Random(11)
        edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(160)})
        edges = [(s, d) for s, d in edges if s != d]
        exp = {k: v for k, v in _brute(edges, "out").items() if v[0] >= 2}
        got = {
            (r["u"], r["v"]): r["common"]
            for r in bibliographic_coupling(_df(spark, edges)).collect()
        }
        assert got == {k: v[0] for k, v in exp.items()}

    def test_center_cap_is_exact(self, spark):
        # hub 99 cites every leaf; with the cap at 3 its pairs vanish
        # and only the two small citers contribute
        edges = [(99, d) for d in range(20)] + SMALL
        got = {
            (r["u"], r["v"]): r["common"]
            for r in cocitation(
                _df(spark, edges), min_common=1, max_center_degree=3
            ).collect()
        }
        exp = {k: v[0] for k, v in _brute(SMALL, "in").items()}
        assert got == exp

    def test_min_common_prunes(self, spark):
        got = cocitation(_df(spark, SMALL), min_common=1).collect()
        assert {(r["u"], r["v"]) for r in got} == {(10, 11), (11, 12), (10, 12)}
