"""Eigenvector centrality: exact-integer walk-count parity on the webmap
fixture, plus degenerate graphs (no edges -> NULL eig, source-only
vertices dropping to 0 walks)."""

import math

from pyspark.sql import functions as F

from linkgraph import eigenvector_centrality
from linkgraph.synth import WEBMAP


def _walks_oracle(adj, n, updates):
    """x_0 = 1; x_k(v) = sum over edges u->v of x_{k-1}(u) — pure ints."""
    x = {v: 1 for v in range(n)}
    for _ in range(updates):
        nxt = {v: 0 for v in range(n)}
        for u, dsts in adj.items():
            for d in dsts:
                nxt[d] += x[u]
        x = nxt
    return x


class TestEigenvector:
    def test_walk_counts_match_oracle(self, webmap_edges):
        out, res = eigenvector_centrality(webmap_edges, updates=6)
        exp = _walks_oracle(WEBMAP, 20, 6)
        got = {r["id"]: (r["walks"], r["eig"]) for r in out.collect()}
        assert set(got) == set(exp)
        mx = max(exp.values())
        for v in exp:
            assert got[v][0] == exp[v]
            assert math.isclose(got[v][1], round(exp[v] / mx, 6), abs_tol=1e-9)
        assert res.supersteps == 6

    def test_no_edges_yields_null_eig(self, spark):
        verts = spark.range(4).select(F.col("id"))
        edges = spark.createDataFrame([], "src long, dst long")
        out, _ = eigenvector_centrality(edges, updates=2, vertices=verts)
        rows = {r["id"]: (r["walks"], r["eig"]) for r in out.collect()}
        assert rows == {i: (0, None) for i in range(4)}

    def test_chain_source_decays(self, spark):
        # 0 -> 1 -> 2: after 2 updates walks = [0, 0, 1]; eig = [0, 0, 1.0]
        edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
        out, _ = eigenvector_centrality(edges, updates=2)
        rows = {r["id"]: (r["walks"], r["eig"]) for r in out.collect()}
        assert rows == {0: (0, 0.0), 1: (0, 0.0), 2: (1, 1.0)}
