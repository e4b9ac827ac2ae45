"""Degenerate-input robustness: empty graphs, single vertices,
self-loops — the engine must converge immediately and return sane
schemas rather than erroring."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from linkgraph import (
    connected_components,
    label_propagation,
    pagerank,
    shortest_paths,
    triangle_counts,
)

_EDGE_SCHEMA = T.StructType(
    [T.StructField("src", T.LongType(), False), T.StructField("dst", T.LongType(), False)]
)


def _empty_edges(spark):
    return spark.createDataFrame([], _EDGE_SCHEMA)


def _verts(spark, ids):
    return spark.createDataFrame(
        [(int(i),) for i in ids], T.StructType([T.StructField("id", T.LongType(), False)])
    )


class TestEdgeCases:
    def test_pagerank_no_edges(self, spark):
        ranks, res = pagerank(_empty_edges(spark), vertices=_verts(spark, [1, 2, 3]), tol=1e-6)
        got = {r["id"]: r["rank"] for r in ranks.collect()}
        # no edges: every vertex holds only teleport mass 0.15/N
        assert all(abs(v - 0.05) < 1e-12 for v in got.values())
        assert res.converged

    def test_pagerank_fully_empty(self, spark):
        ranks, res = pagerank(_empty_edges(spark))
        assert ranks.count() == 0 and res.converged

    def test_cc_no_edges(self, spark):
        comp, res = connected_components(
            _empty_edges(spark), vertices=_verts(spark, [5, 9])
        )
        assert {r["id"]: r["component"] for r in comp.collect()} == {5: 5, 9: 9}
        assert res.converged

    def test_lpa_single_vertex(self, spark):
        labels, res = label_propagation(
            _empty_edges(spark), vertices=_verts(spark, [42])
        )
        assert labels.collect()[0]["label"] == 42

    def test_sssp_source_only(self, spark):
        dist, _ = shortest_paths(_empty_edges(spark), source=1, vertices=_verts(spark, [1, 2]))
        got = {r["id"]: r["distance"] for r in dist.collect()}
        assert got[1] == 0.0 and got[2] is None

    def test_triangles_self_loop_only(self, spark):
        edges = spark.createDataFrame([(1, 1)], _EDGE_SCHEMA)
        tri = triangle_counts(edges)
        assert {r["triangles"] for r in tri.collect()} == {0}

    def test_pagerank_self_loop_mass(self, spark):
        # a pure self-loop vertex keeps feeding itself: rank converges to
        # the closed-form fixpoint r = 0.15/N + 0.85 r  ->  r = 1/N
        edges = spark.createDataFrame([(1, 1)], _EDGE_SCHEMA)
        ranks, res = pagerank(edges, vertices=_verts(spark, [1, 2]), tol=1e-9)
        got = {r["id"]: r["rank"] for r in ranks.collect()}
        assert abs(got[1] - 0.5) < 1e-6 and abs(got[2] - 0.075) < 1e-9
