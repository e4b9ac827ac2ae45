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


class TestTriangleDelta:
    @staticmethod
    def _tri(edges):
        import itertools

        pairs = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        verts = sorted({v for e in pairs for v in e})
        return sum(
            1
            for a, b, c in itertools.combinations(verts, 3)
            if (a, b) in pairs and (a, c) in pairs and (b, c) in pairs
        )

    def test_matches_full_recount(self, spark):
        from linkgraph.algorithms.diff import triangle_delta

        old = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5)]
        # remove (0,2) killing triangle 012; add (4,0),(5,0),(4,5 dup)
        # and (3,5) creating 345-side triangles
        new = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 4), (4, 5), (0, 4),
               (0, 5), (3, 5)]
        o = spark.createDataFrame(old, "src long, dst long")
        n = spark.createDataFrame(new, "src long, dst long")
        r = triangle_delta(o, n).collect()[0]
        assert r["delta"] == self._tri(new) - self._tri(old)
        assert r["gained"] - r["lost"] == r["delta"]
        assert r["lost"] >= 1  # triangle 0-1-2 died with (0,2)

    def test_shared_triangle_counted_once(self, spark):
        """A triangle gaining ALL THREE edges at once counts once."""
        from linkgraph.algorithms.diff import triangle_delta

        o = spark.createDataFrame([(9, 8)], "src long, dst long")
        n = spark.createDataFrame(
            [(9, 8), (0, 1), (1, 2), (2, 0)], "src long, dst long"
        )
        r = triangle_delta(o, n).collect()[0]
        assert (r["gained"], r["lost"], r["delta"]) == (1, 0, 1)

    def test_no_change(self, spark):
        from linkgraph.algorithms.diff import triangle_delta

        o = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
        r = triangle_delta(o, o).collect()[0]
        assert (r["gained"], r["lost"], r["delta"]) == (0, 0, 0)
