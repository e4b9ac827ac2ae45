"""K-hop integer feature propagation (algorithms/khop.py)."""

import pytest


def _brute(edges, feats, hops):
    verts = sorted({v for e in edges for v in e} | set(feats))
    f = {v: feats.get(v, 0) for v in verts}
    hist = {v: [f[v]] for v in verts}
    inn = {}
    for s, d in set(edges):
        inn.setdefault(d, []).append(s)
    for _ in range(hops):
        nf = {}
        for v in verts:
            ns = inn.get(v, [])
            mean = sum(f[u] for u in ns) // len(ns) if ns else f[v]
            nf[v] = (f[v] + mean) // 2
        f = nf
        for v in verts:
            hist[v].append(f[v])
    return hist


class TestKhop:
    def test_matches_bruteforce(self, spark):
        from linkgraph.algorithms.khop import khop_features

        edges = [(0, 1), (1, 2), (2, 0), (3, 1), (0, 2), (4, 4 % 5)]
        feats = {0: 10, 1: 100, 2: 7, 3: 55, 4: 1000}
        e = spark.createDataFrame(edges, "src long, dst long")
        fdf = spark.createDataFrame(list(feats.items()), "id long, f long")
        got = {
            r["id"]: [r["f0"], r["f1"], r["f2"], r["f3"]]
            for r in khop_features(e, fdf, hops=3).collect()
        }
        assert got == _brute(edges, feats, 3)

    def test_missing_feature_defaults_zero_isolated_fixed(self, spark):
        from linkgraph.algorithms.khop import khop_features

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        fdf = spark.createDataFrame([(0, 8)], "id long, f long")
        verts = spark.createDataFrame([(0,), (1,), (9,)], "id long")
        got = {r["id"]: (r["f0"], r["f1"]) for r in
               khop_features(e, fdf, hops=1, vertices=verts).collect()}
        assert got[1] == (0, 4)   # (0 + mean(8)) // 2
        assert got[9] == (0, 0)   # isolated vertex is a fixed point
        assert got[0] == (8, 8)   # no in-neighbors: self-fallback

    def test_rejects_negative_features(self, spark):
        from linkgraph.algorithms.khop import khop_features

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        fdf = spark.createDataFrame([(0, -1)], "id long, f long")
        with pytest.raises(ValueError):
            khop_features(e, fdf, hops=1)

    def test_rejects_zero_hops(self, spark):
        from linkgraph.algorithms.khop import khop_features

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        fdf = spark.createDataFrame([(0, 1)], "id long, f long")
        with pytest.raises(ValueError):
            khop_features(e, fdf, hops=0)
