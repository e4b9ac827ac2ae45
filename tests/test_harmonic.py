"""Harmonic and closeness centrality from FM sketches (algorithms/
anf.py): the per-vertex integer accumulators match an exact Python
replay of the sketch evolution, and estimates track exact values."""

import hashlib
import math
from collections import deque

from linkgraph.algorithms.anf import (
    FM_PHI,
    closeness_centrality,
    harmonic_centrality,
)

SEED = 42


def _init_bit(v: int, i: int, seed: int) -> int:
    h = int(hashlib.md5(f"anf:{seed}:{i}:{v}".encode()).hexdigest()[:15], 16)
    tz = (h & -h).bit_length() - 1 if h else 64
    return 1 << min(tz, 62)


def _rank(s: int) -> int:
    inv = ~s & ((1 << 64) - 1)
    low = inv & (s + 1)
    return low.bit_length() - 1 if low else 64


def _est_units(sketches: list[int], K: int) -> int:
    r = sum(_rank(s) for s in sketches)
    x = (2.0 ** (r / K)) / FM_PHI * 1_000_000.0
    return math.floor(x + 0.5)  # ROUND half-up, as both engines do


def _sim_harmonic(edges, vertices, K, max_h, seed):
    nbrs = {v: set() for v in vertices}
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    sk = {v: [_init_bit(v, i, seed) for i in range(K)] for v in vertices}
    eu = {v: _est_units(sk[v], K) for v in vertices}
    hc = {v: 0 for v in vertices}
    lcm = math.lcm(*range(1, max_h + 1))
    for h in range(1, max_h + 1):
        new = {
            v: [
                sk[v][i] | eval_or(nbrs[v], sk, i)
                for i in range(K)
            ]
            for v in vertices
        }
        sk = new
        for v in vertices:
            e2 = _est_units(sk[v], K)
            hc[v] += (e2 - eu[v]) * (lcm // h)
            eu[v] = e2
    return hc, lcm


def eval_or(ns, sk, i):
    out = 0
    for n in ns:
        out |= sk[n][i]
    return out


def _exact_harmonic(edges, vertices):
    nbrs = {v: set() for v in vertices}
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    out = {}
    for v in vertices:
        dist = {v: 0}
        q = deque([v])
        while q:
            u = q.popleft()
            for w in nbrs[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        out[v] = sum(1.0 / d for u, d in dist.items() if u != v)
    return out


class TestHarmonicCentrality:
    def test_matches_exact_sketch_replay(self, spark):
        import random

        rng = random.Random(7)
        edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(70)})
        verts = sorted({v for e in edges for v in e})
        e = spark.createDataFrame(edges, "src long, dst long")
        out, res = harmonic_centrality(e, num_maps=8, max_h=5, portable=True, seed=SEED)
        got = {r["id"]: r["harmonic_units"] for r in out.collect()}
        want, lcm = _sim_harmonic(edges, verts, 8, 5, SEED)
        assert got == want
        # harmonic_est is the unit value rescaled
        ests = {r["id"]: r["harmonic_est"] for r in out.collect()}
        for v in verts:
            assert abs(ests[v] - want[v] / (lcm * 1e6)) < 1e-6

    def test_estimates_track_exact_harmonic(self, spark):
        import random

        rng = random.Random(23)
        edges = list({(rng.randrange(50), rng.randrange(50)) for _ in range(120)})
        verts = sorted({v for e in edges for v in e})
        e = spark.createDataFrame(edges, "src long, dst long")
        out, _ = harmonic_centrality(e, num_maps=64, max_h=6, portable=True)
        got = {r["id"]: r["harmonic_est"] for r in out.collect()}
        exact = _exact_harmonic(edges, verts)
        # FM with 64 maps: ~10% std error per ball; allow 35% per vertex
        # and 15% on the graph total
        tot_got = sum(got.values())
        tot_exact = sum(exact.values())
        assert abs(tot_got - tot_exact) / tot_exact < 0.15
        bad = [v for v in verts if abs(got[v] - exact[v]) / max(exact[v], 1e-9) > 0.35]
        assert len(bad) <= len(verts) // 10, bad

    def test_early_stop_equals_full_unroll(self, spark):
        edges = [(0, 1), (1, 2), (2, 3)]
        e = spark.createDataFrame(edges, "src long, dst long")
        full, r_full = harmonic_centrality(e, num_maps=16, max_h=8, portable=True)
        # diameter 3: sketches stable by depth 3, detected at 4
        assert r_full.converged and r_full.supersteps <= 5
        want, _ = _sim_harmonic(edges, [0, 1, 2, 3], 16, 8, SEED)
        got = {r["id"]: r["harmonic_units"] for r in full.collect()}
        assert got == want

    def test_fast_mode_runs(self, spark):
        e = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
        out, res = harmonic_centrality(e, num_maps=8, max_h=4, portable=False)
        rows = out.collect()
        assert len(rows) == 3
        assert all(r["harmonic_units"] >= 0 for r in rows)


def _sim_closeness(edges, vertices, K, max_h, seed):
    """Exact replay of the closeness accumulators over the same
    simulated sketch evolution as _sim_harmonic."""
    nbrs = {v: set() for v in vertices}
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    sk = {v: [_init_bit(v, i, seed) for i in range(K)] for v in vertices}
    eu = {v: _est_units(sk[v], K) for v in vertices}
    ds = {v: 0 for v in vertices}
    du = {v: 0 for v in vertices}
    for h in range(1, max_h + 1):
        sk = {
            v: [sk[v][i] | eval_or(nbrs[v], sk, i) for i in range(K)]
            for v in vertices
        }
        for v in vertices:
            e2 = _est_units(sk[v], K)
            ds[v] += (e2 - eu[v]) * h
            du[v] += e2 - eu[v]
            eu[v] = e2
    return ds, du


class TestClosenessCentrality:
    def test_matches_exact_sketch_replay(self, spark):
        import random

        rng = random.Random(11)
        edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(70)})
        verts = sorted({v for e in edges for v in e})
        e = spark.createDataFrame(edges, "src long, dst long")
        out, _ = closeness_centrality(e, num_maps=8, max_h=5, portable=True, seed=SEED)
        rows = {r["id"]: r for r in out.collect()}
        ds, du = _sim_closeness(edges, verts, 8, 5, SEED)
        assert {v: rows[v]["dist_sum_units"] for v in verts} == ds
        assert {v: rows[v]["reachable_units"] for v in verts} == du
        for v in verts:
            want = du[v] / ds[v] if ds[v] > 0 else 0.0
            assert rows[v]["closeness_est"] == want

    def test_estimates_track_exact_closeness(self, spark):
        import random

        rng = random.Random(29)
        edges = list({(rng.randrange(50), rng.randrange(50)) for _ in range(130)})
        verts = sorted({v for e in edges for v in e})
        e = spark.createDataFrame(edges, "src long, dst long")
        out, _ = closeness_centrality(e, num_maps=64, max_h=6, portable=True)
        got = {r["id"]: r["closeness_est"] for r in out.collect()}
        # exact 1/avg-distance over each vertex's reachable set
        nbrs = {v: set() for v in verts}
        for s, d in edges:
            if s != d:
                nbrs[s].add(d)
                nbrs[d].add(s)
        bad = 0
        for v in verts:
            dist = {v: 0}
            q = deque([v])
            while q:
                u = q.popleft()
                for w in nbrs[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        q.append(w)
            dsum = sum(d for u, d in dist.items() if u != v)
            exact = (len(dist) - 1) / dsum if dsum else 0.0
            if exact and abs(got[v] - exact) / exact > 0.2:
                bad += 1
        assert bad <= len(verts) // 10
