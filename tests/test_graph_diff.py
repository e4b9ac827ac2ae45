"""Graph snapshot diff (algorithms/diff.py)."""

from linkgraph.algorithms.diff import edge_diff, vertex_delta

OLD = [(0, 1), (1, 2), (2, 3), (3, 0)]
NEW = [(0, 1), (1, 2), (2, 4), (4, 0), (1, 3)]


class TestGraphDiff:
    def test_edge_diff(self, spark):
        o = spark.createDataFrame(OLD, "src long, dst long")
        n = spark.createDataFrame(NEW, "src long, dst long")
        got = {(r["src"], r["dst"], r["op"]) for r in edge_diff(o, n).collect()}
        assert got == {
            (2, 4, "add"), (4, 0, "add"), (1, 3, "add"),
            (2, 3, "del"), (3, 0, "del"),
        }

    def test_vertex_delta_only_changed(self, spark):
        o = spark.createDataFrame(OLD, "src long, dst long")
        n = spark.createDataFrame(NEW, "src long, dst long")
        got = {r["id"]: (r["d_out"], r["d_in"]) for r in vertex_delta(o, n).collect()}
        # adds (2,4),(4,0),(1,3); dels (2,3),(3,0): vertices 0 and 2
        # have offsetting +1/-1 changes and must NOT appear
        assert got == {4: (1, 1), 1: (1, 0), 3: (-1, 0)}
        assert 0 not in got and 2 not in got

    def test_identical_snapshots_empty(self, spark):
        o = spark.createDataFrame(OLD, "src long, dst long")
        assert edge_diff(o, o).count() == 0
        assert vertex_delta(o, o).count() == 0

    def test_duplicates_deduped(self, spark):
        o = spark.createDataFrame([(0, 1), (0, 1)], "src long, dst long")
        n = spark.createDataFrame([(0, 1), (0, 2), (0, 2)], "src long, dst long")
        got = {(r["src"], r["dst"], r["op"]) for r in edge_diff(o, n).collect()}
        assert got == {(0, 2, "add")}


class TestDiffDrivenWarmRestart:
    def test_delta_frontier_resumes_cc(self, spark):
        """Composition: edge_diff/vertex_delta feed a CC warm restart —
        the frontier is exactly the changed vertices, and the resumed
        run matches a cold run on the new snapshot in fewer supersteps."""
        from linkgraph import connected_components
        from linkgraph.algorithms.diff import vertex_delta

        # two long paths, then a bridge edge arrives between them
        old_edges = [(i, i + 1) for i in range(0, 9)] + [
            (i, i + 1) for i in range(10, 19)
        ]
        new_edges = old_edges + [(4, 14)]
        o = spark.createDataFrame(old_edges, "src long, dst long")
        n = spark.createDataFrame(new_edges, "src long, dst long")

        cold_labels, cold = connected_components(n)
        prev, _ = connected_components(o)
        frontier = vertex_delta(o, n).select("id")
        warm_labels, warm = connected_components(
            n, init_labels=prev, initial_active=frontier
        )
        assert {(r["id"], r["component"]) for r in warm_labels.collect()} == {
            (r["id"], r["component"]) for r in cold_labels.collect()
        }
        assert warm.supersteps < cold.supersteps
