"""PPR sweep-cut local community tests (ACL sweep)."""

from linkgraph.algorithms.localcluster import ppr_sweep_cut


class TestSweepCut:
    def test_two_cliques_bridge(self, spark):
        """Two 5-cliques joined by one bridge edge: seeding in clique A
        must put the conductance minimum exactly at the 5-vertex
        prefix (cut = 1 bridge edge, volume = 21)."""
        a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        b = [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
        e = spark.createDataFrame(a + b + [(0, 5)], "src long, dst long")
        sweep = ppr_sweep_cut(e, [1], fixed_updates=8, top_t=10).collect()
        by_k = {r["k"]: r for r in sweep}
        best = min(
            (r for r in sweep if r["conductance"] is not None),
            key=lambda r: (r["conductance"], r["k"]),
        )
        assert best["k"] == 5
        assert by_k[5]["cut"] == 1
        # clique A volume: 4*5 internal ends + 1 bridge end = 21
        assert by_k[5]["volume"] == 21
        # the 5-vertex prefix IS clique A
        assert {by_k[k]["id"] for k in range(1, 6)} == {0, 1, 2, 3, 4}

    def test_prefix_invariants(self, spark):
        """cut(k) = vol(k) - 2*e_in(k) must stay non-negative and the
        k=1 prefix's cut equals its degree on any graph."""
        e = spark.createDataFrame(
            [(i, (i * 7 + 3) % 20) for i in range(20)]
            + [(i, i + 1) for i in range(19)],
            "src long, dst long",
        )
        rows = ppr_sweep_cut(e, [0], fixed_updates=6, top_t=12).collect()
        assert rows[0]["cut"] == rows[0]["deg"]
        for r in rows:
            assert r["cut"] >= 0
            assert r["volume"] >= r["cut"]


class TestCommunityConductance:
    def test_two_cliques_bridge(self, spark):
        from pyspark.sql import functions as F

        from linkgraph.algorithms.stats import community_conductance

        a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        b = [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
        e = spark.createDataFrame(a + b + [(0, 5)], "src long, dst long")
        labels = spark.createDataFrame(
            [(i, i // 5) for i in range(10)], "id long, label long"
        )
        out = {r["community"]: r for r in community_conductance(e, labels).collect()}
        # each clique: volume 21 (20 internal ends + 1 bridge end), cut 1
        for c in (0, 1):
            assert out[c]["n_members"] == 5
            assert out[c]["volume"] == 21
            assert out[c]["cut"] == 1
            assert abs(out[c]["conductance"] - 1 / 21) < 1e-6

    def test_whole_graph_community_is_null(self, spark):
        from linkgraph.algorithms.stats import community_conductance

        e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
        labels = spark.createDataFrame(
            [(0, 9), (1, 9), (2, 9)], "id long, label long"
        )
        rows = community_conductance(e, labels).collect()
        assert len(rows) == 1 and rows[0]["conductance"] is None
