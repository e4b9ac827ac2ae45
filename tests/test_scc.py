"""Strongly connected components (algorithms/scc.py): labels equal the
minimum mutually-reachable id, verified against brute-force transitive
closure on handcrafted and pseudorandom digraphs."""

from pyspark.sql import functions as F

from linkgraph.algorithms.scc import strongly_connected_components
from linkgraph.synth import edges_df


def _brute_scc(n, edges):
    reach = [[False] * n for _ in range(n)]
    for a, b in edges:
        reach[a][b] = True
    for k in range(n):
        for i in range(n):
            if reach[i][k]:
                row_k = reach[k]
                row_i = reach[i]
                for j in range(n):
                    if row_k[j]:
                        row_i[j] = True
    return sorted(
        (
            v,
            min([v] + [u for u in range(n) if reach[u][v] and reach[v][u]]),
        )
        for v in range(n)
    )


def _run(spark, edges, vertices=None):
    scc, res = strongly_connected_components(
        edges_df(spark, edges), vertices=vertices
    )
    return sorted((r["id"], r["scc"]) for r in scc.collect()), res


class TestSCC:
    def test_two_cycles_bridge_and_chain(self, spark):
        # {0,1,2} and {3,4,5} are 3-cycles joined one-way by 2->3 (no
        # merge: SCCs need MUTUAL reachability); 6->7->8 is a DAG chain
        edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3),
                 (6, 7), (7, 8)]
        got, res = _run(spark, edges)
        assert got == [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3),
                       (6, 6), (7, 7), (8, 8)]
        assert res.converged

    def test_dag_collapses_fast(self, spark):
        # pure chain: every vertex its own SCC; the (f, b) refinement
        # must kill it in few rounds (not O(n) like naive coloring)
        n = 40
        edges = [(i, i + 1) for i in range(n - 1)]
        got, res = _run(spark, edges)
        assert got == [(i, i) for i in range(n)]
        assert res.converged

    def test_isolated_vertices(self, spark):
        verts = spark.range(6).select(F.col("id"))
        got, _ = _run(spark, [(0, 1), (1, 0)], vertices=verts)
        assert got == [(0, 0), (1, 0), (2, 2), (3, 3), (4, 4), (5, 5)]

    def test_nested_cycles_with_tail(self, spark):
        # figure-eight through 2 plus an exit tail: one SCC {0..4},
        # tail vertices singleton
        edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2),
                 (4, 5), (5, 6)]
        got, _ = _run(spark, edges)
        assert got == [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0),
                       (5, 5), (6, 6)]

    def test_matches_brute_force_random(self, spark):
        n = 30
        edges = sorted(
            {((i * 7 + j * j * 5) % n, (i * 3 + j * 11) % n)
             for i in range(n) for j in range(3)}
            - {(i, i) for i in range(n)}
        )
        got, res = _run(
            spark, edges, vertices=spark.range(n).select(F.col("id"))
        )
        assert got == _brute_scc(n, edges)
        assert res.converged

    def test_matches_brute_force_sparse(self, spark):
        # sparser graph -> many small SCCs and longer chains
        n = 40
        edges = sorted(
            {((i * 13 + 7) % n, (i * 29 + j) % n)
             for i in range(n) for j in range(2)}
            - {(i, i) for i in range(n)}
        )
        got, _ = _run(
            spark, edges, vertices=spark.range(n).select(F.col("id"))
        )
        assert got == _brute_scc(n, edges)
