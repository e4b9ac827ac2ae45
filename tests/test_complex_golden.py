"""Golden parity on the webmapcomplex fixture — the reference's
*RealComplex suite (dangling message-materialized vertices, conf-driven
N) plus ShortestPathsReal on webmap."""

import math

import pytest
from pyspark.sql import types as T

from linkgraph import connected_components, pagerank, shortest_paths
from linkgraph.synth import WEBMAP, WEBMAPCOMPLEX, adjacency_to_edges, edges_df

# expected/PageRankRealComplex/part-* — NUM_VERTICE=23 (input lines),
# maxIter=10 == 9 updates; vertices 22/23/24/50/99/101 are
# message-materialized and dangling.
GOLDEN_PR_COMPLEX = {
    0: 0.0072088164890121405, 1: 0.12352056961948689, 2: 0.12045670441668178,
    3: 0.06798545786459467, 4: 0.03387281259892814, 5: 0.01942600635480669,
    6: 0.013661020012182747, 7: 0.0109034351563503, 8: 0.009241684574402657,
    9: 0.008082028259564783, 10: 0.007208817414047232, 11: 0.0755583921984586,
    12: 0.0724945269956535, 13: 0.05063539695954155, 14: 0.029644452692487822,
    15: 0.018670183493927354, 16: 0.013558283213067561, 17: 0.010892790899883237,
    18: 0.00924087459366106, 19: 0.008081987856433137, 21: 0.006521739130434782,
    22: 0.008369565217391304, 23: 0.008369565217391304, 24: 0.008369565217391304,
    25: 0.006521739130434782, 27: 0.006521739130434782, 50: 0.009585604333239883,
    99: 0.009585604333239883, 101: 0.028380869166546724,
}

# expected/ConnectedComponentsRealComplex/part-* (directed semantics).
# 22/23/24/50 never materialize in the reference (their only in-
# neighbor never changes its label, so it never sends); compare on the
# golden id set.
GOLDEN_CC_COMPLEX = {
    0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1, 8: 1, 9: 1, 10: 1,
    11: 0, 12: 0, 13: 0, 14: 0, 15: 0, 16: 0, 17: 0, 18: 0, 19: 0,
    21: 21, 25: 25, 27: 27, 99: 1, 101: 0,
}

# expected/ShortestPathsReal/part-* — webmap, source 0, unit weights.
GOLDEN_SSSP_REAL = {i: float(i) for i in range(20)}


@pytest.fixture(scope="module")
def complex_edges(spark):
    return edges_df(spark, adjacency_to_edges(WEBMAPCOMPLEX)).cache()


@pytest.fixture(scope="module")
def complex_vertices(spark):
    ids = sorted(set(WEBMAPCOMPLEX) | {d for ds in WEBMAPCOMPLEX.values() for d in ds})
    return spark.createDataFrame(
        [(int(i),) for i in ids], T.StructType([T.StructField("id", T.LongType(), False)])
    ).cache()


class TestComplexGoldens:
    def test_pagerank_complex(self, complex_edges, complex_vertices):
        ranks, _ = pagerank(
            complex_edges,
            fixed_updates=9,
            vertices=complex_vertices,
            num_vertices=23,
        )
        got = {r["id"]: r["rank"] for r in ranks.collect()}
        for v, exp in GOLDEN_PR_COMPLEX.items():
            assert math.isclose(got[v], exp, abs_tol=1e-6), f"vertex {v}"

    def test_cc_complex_directed(self, complex_edges, complex_vertices):
        comp, _ = connected_components(
            complex_edges, symmetrize_edges=False, vertices=complex_vertices
        )
        got = {r["id"]: r["component"] for r in comp.collect()}
        for v, exp in GOLDEN_CC_COMPLEX.items():
            assert got[v] == exp, f"vertex {v}: got {got[v]} want {exp}"

    def test_sssp_real(self, webmap_edges):
        dist, _ = shortest_paths(webmap_edges, source=0)
        got = {r["id"]: r["distance"] for r in dist.collect()}
        assert got == GOLDEN_SSSP_REAL
