"""Reachability golden tests (reference ReachibilityRealComplex /
ReachibilityRealComplexNoConnectivity expected outputs) plus a pure-
Python closure oracle for the fixpoint mode."""

import pytest
from pyspark.sql import types as T

from linkgraph import reachability
from linkgraph.synth import WEBMAPCOMPLEX, adjacency_to_edges, edges_df

# expected/ReachibilityRealComplex/part-* — src=1, dst=10, early stop at
# the meeting superstep (vertex 0 never receives the 2-mark because the
# job terminates before v19's messages are delivered).
GOLDEN_MEET = {
    0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1, 8: 1, 9: 1,
    10: 3, 11: 2, 12: 2, 13: 2, 14: 2, 15: 2, 16: 2, 17: 2, 18: 2, 19: 2,
    21: 0, 25: 0, 27: 0, 99: 2, 101: 2,
}

# expected/ReachibilityRealComplexNoConnectivity/part-* — src=1, dst=25;
# the searches never meet, so propagation runs to the closure fixpoint.
GOLDEN_NOMEET = {
    0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1, 8: 1, 9: 1,
    10: 1, 11: 1, 12: 1, 13: 1, 14: 1, 15: 1, 16: 1, 17: 1, 18: 1, 19: 1,
    21: 0, 25: 2, 27: 0, 50: 1, 99: 1, 101: 1,
}


def _closure(adj: dict, root: int) -> set:
    seen, frontier = {root}, [root]
    while frontier:
        nxt = []
        for v in frontier:
            for w in adj.get(v, []):
                if w not in seen:
                    seen.add(w)
                    nxt.append(w)
        frontier = nxt
    return seen


@pytest.fixture(scope="module")
def complex_graph(spark):
    edges = edges_df(spark, adjacency_to_edges(WEBMAPCOMPLEX)).cache()
    ids = sorted(set(WEBMAPCOMPLEX) | {d for ds in WEBMAPCOMPLEX.values() for d in ds})
    verts = spark.createDataFrame(
        [(int(i),) for i in ids], T.StructType([T.StructField("id", T.LongType(), False)])
    ).cache()
    return edges, verts


class TestReachability:
    def test_golden_meet(self, complex_graph):
        edges, verts = complex_graph
        states, reachable, res = reachability(edges, source=1, dest=10, vertices=verts)
        assert reachable
        got = {r["id"]: r["state"] for r in states.collect()}
        for v, exp in GOLDEN_MEET.items():
            assert got[v] == exp, f"vertex {v}: got {got[v]} want {exp}"

    def test_golden_no_meet(self, complex_graph):
        edges, verts = complex_graph
        states, reachable, res = reachability(edges, source=1, dest=25, vertices=verts)
        assert not reachable
        got = {r["id"]: r["state"] for r in states.collect()}
        for v, exp in GOLDEN_NOMEET.items():
            assert got[v] == exp, f"vertex {v}: got {got[v]} want {exp}"

    def test_fixpoint_matches_closure_oracle(self, complex_graph):
        edges, verts = complex_graph
        states, reachable, _ = reachability(
            edges, source=1, dest=10, early_terminate=False, vertices=verts
        )
        rs, rd = _closure(WEBMAPCOMPLEX, 1), _closure(WEBMAPCOMPLEX, 10)
        got = {r["id"]: r["state"] for r in states.collect()}
        for v, s in got.items():
            assert s == (1 if v in rs else 0) | (2 if v in rd else 0)
        assert reachable == bool(rs & rd)

    def test_source_equals_dest(self, complex_graph):
        edges, verts = complex_graph
        states, reachable, _ = reachability(edges, source=5, dest=5, vertices=verts)
        assert reachable
        got = {r["id"]: r["state"] for r in states.collect()}
        assert got[5] == 2 and all(s == 0 for v, s in got.items() if v != 5)
