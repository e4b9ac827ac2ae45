"""Borůvka minimum spanning forest (algorithms/msf.py): matches a
brute-force Kruskal under the identical total edge order; forest
invariants hold; deterministic across partitionings."""

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.msf import minimum_spanning_forest

# two components: a weighted 6-vertex blob and a 3-cycle; plus a
# parallel edge (1,2) with differing weights and a self loop
EDGES = [
    (0, 1, 4), (1, 2, 7), (2, 1, 3), (0, 2, 9),
    (2, 3, 1), (3, 4, 2), (4, 0, 8), (1, 4, 5), (4, 5, 6), (5, 0, 2),
    (10, 11, 1), (11, 12, 1), (12, 10, 1),
    (3, 3, 0),
]


def _brute_kruskal(edges):
    canon = {}
    for s, d, w in edges:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        canon[(u, v)] = min(canon.get((u, v), w), w)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (u, v), w in sorted(((k, w) for k, w in canon.items()),
                            key=lambda t: (t[1], t[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long, w long").cache()


class TestMSF:
    def test_matches_bruteforce_kruskal(self, edges_df):
        out, rounds = minimum_spanning_forest(edges_df, weight_col="w")
        got = {(r.u, r.v, r.weight) for r in out.collect()}
        assert got == _brute_kruskal(EDGES)
        assert rounds >= 1

    def test_forest_size_and_partition_invariance(self, edges_df):
        out, _ = minimum_spanning_forest(edges_df, weight_col="w")
        got = {(r.u, r.v, r.weight) for r in out.collect()}
        # 9 vertices total ({0..5} ∪ {10,11,12}), 2 components
        assert len(got) == 9 - 2
        out2, _ = minimum_spanning_forest(
            edges_df.repartition(7), weight_col="w"
        )
        assert got == {(r.u, r.v, r.weight) for r in out2.collect()}

    def test_unweighted_defaults_to_weight_one(self, spark):
        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0)], "src long, dst long"
        )
        out, _ = minimum_spanning_forest(df)
        got = {(r.u, r.v, r.weight) for r in out.collect()}
        # unique under the (u, v) tie order: the two lexicographically
        # smallest edges of the triangle
        assert got == {(0, 1, 1), (0, 2, 1)}

    def test_parallel_edges_keep_min_weight(self, spark):
        df = spark.createDataFrame(
            [(0, 1, 9), (1, 0, 2), (0, 1, 5)], "src long, dst long, w long"
        )
        out, _ = minimum_spanning_forest(df, weight_col="w")
        assert {(r.u, r.v, r.weight) for r in out.collect()} == {(0, 1, 2)}

    def test_empty_and_self_loop_only(self, spark):
        df = spark.createDataFrame([(3, 3, 1)], "src long, dst long, w long")
        out, rounds = minimum_spanning_forest(df, weight_col="w")
        assert out.count() == 0 and rounds == 0

    def test_chain_merges_in_log_rounds(self, spark):
        # a 64-vertex path: Borůvka contracts it in <= ~log2(64) rounds
        n = 64
        df = spark.createDataFrame(
            [(i, i + 1, 1 + (i * 31 + i + 1) % 97) for i in range(n - 1)],
            "src long, dst long, w long",
        )
        out, rounds = minimum_spanning_forest(df, weight_col="w")
        assert out.count() == n - 1  # a tree keeps every edge
        assert rounds <= 8
