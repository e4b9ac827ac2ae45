"""Neighborhood MinHash-LSH pairs (algorithms/structsim.py):
exact-Jaccard verification vs brute force (LSH layer can only MISS
pairs, never report a wrong score), portable == production recall on
identical neighbor sets, and the banding recall guarantee for
identical neighborhoods."""

import random
from itertools import combinations

from linkgraph.algorithms.structsim import neighborhood_minhash_pairs


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _sym_adj(edges):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return adj


def _brute_pairs(edges, threshold):
    adj = _sym_adj(edges)
    out = {}
    for u, v in combinations(sorted(adj), 2):
        c = len(adj[u] & adj[v])
        if not c:
            continue
        j = c / len(adj[u] | adj[v])
        if j >= threshold:
            out[(u, v)] = (c, j)
    return out


class TestStructSim:
    def test_identical_neighborhoods_always_found(self, spark):
        # 0 and 1 both adjacent to exactly {10, 11, 12}: Jaccard 1.0 ->
        # identical signatures -> identical buckets in EVERY band
        edges = [(0, 10), (0, 11), (0, 12), (1, 10), (1, 11), (1, 12), (5, 10)]
        got = {
            (r["u"], r["v"]): (r["common"], r["jaccard"])
            for r in neighborhood_minhash_pairs(
                _df(spark, edges), threshold=0.9
            ).collect()
        }
        assert (0, 1) in got
        # common = |{10,11,12}| = 3, but NOTE the symmetrized graph also
        # gives 10,11,12 neighbors {0,1(,5)}; only (0,1) passes 0.9
        assert got[(0, 1)][0] == 3 and got[(0, 1)][1] == 1.0

    def test_scores_exact_subset_of_brute(self, spark):
        rng = random.Random(3)
        edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(150)})
        edges = [(s, d) for s, d in edges if s != d]
        exp = _brute_pairs(edges, 0.3)
        got = {
            (r["u"], r["v"]): (r["common"], r["jaccard"])
            for r in neighborhood_minhash_pairs(
                _df(spark, edges), threshold=0.3, num_hashes=32, bands=16
            ).collect()
        }
        # every reported pair must carry the exact brute-force score
        for k, (c, j) in got.items():
            assert k in exp
            assert exp[k][0] == c
            assert abs(exp[k][1] - j) < 1e-12
        # with 16 bands of 2 rows, recall at J >= 0.5 is near-certain:
        # miss probability (1 - J^2)^16 <= (3/4)^16 < 1%
        for k, (c, j) in exp.items():
            if j >= 0.5:
                assert k in got

    def test_portable_matches_production_pairs(self, spark):
        rng = random.Random(9)
        edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(120)})
        edges = [(s, d) for s, d in edges if s != d]
        kw = dict(threshold=0.25, num_hashes=32, bands=16)
        fast = neighborhood_minhash_pairs(_df(spark, edges), portable=False, **kw)
        port = neighborhood_minhash_pairs(_df(spark, edges), portable=True, **kw)
        f = {(r["u"], r["v"]): (r["common"], r["jaccard"]) for r in fast.collect()}
        p = {(r["u"], r["v"]): (r["common"], r["jaccard"]) for r in port.collect()}
        # the two hash families may MISS different near-threshold pairs
        # (that is LSH), but any pair both report carries the identical
        # exact verification score...
        for k in set(f) & set(p):
            assert f[k] == p[k]
        # ...and both recover every strongly-similar pair: at 16 bands
        # of 2 rows the miss probability at J >= 0.6 is
        # (1 - 0.36)^16 < 0.1%
        strong = {k for k, (c, j) in _brute_pairs(edges, 0.6).items()}
        assert strong <= set(f) and strong <= set(p)
