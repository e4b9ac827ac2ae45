"""Golden parity for the EarlyTermination and MessageOverflow fixtures.

Expected values transcribed from the reference's committed outputs
(pregelix-example/src/test/resources/expected/EarlyTermination/part-0..3
and expected/MessageOverflow{,Fixedsize}/part-0..3 — the two overflow
goldens are byte-identical, and MessageOverflowLSM shares the same
answer). Comparison is multiset equality over (id, value) pairs, the
PregelixTestUtils.java:31-66 semantics (integers here, so exact).
"""

from linkgraph import early_termination_demo, message_overflow_demo
from linkgraph.synth import WEBMAP, adjacency_to_edges, edges_df

# expected/EarlyTermination/part-0..3: id%4==2 -> 0 (partition frozen in
# superstep 1), id%4==3 -> 1 (frozen in superstep 2), else 2
GOLDEN_EARLY_TERMINATION = {
    i: (0 if i % 4 == 2 else 1 if i % 4 == 3 else 2) for i in range(20)
}

# expected/MessageOverflow/part-0..3 (== MessageOverflowFixedsize):
# value = 10000 * indegree on webmap
GOLDEN_MESSAGE_OVERFLOW = {
    0: 10000, 4: 70000, 8: 30000, 12: 90000, 16: 50000,
    1: 100000, 5: 60000, 9: 20000, 13: 80000, 17: 40000,
    2: 90000, 6: 50000, 10: 10000, 14: 70000, 18: 30000,
    3: 80000, 7: 40000, 11: 100000, 15: 60000, 19: 20000,
}


def test_early_termination_golden(spark):
    got = {r["id"]: r["value"] for r in early_termination_demo(spark).collect()}
    assert got == GOLDEN_EARLY_TERMINATION


def test_message_overflow_golden(spark, webmap_edges):
    got = {r["id"]: r["value"] for r in message_overflow_demo(webmap_edges).collect()}
    assert got == GOLDEN_MESSAGE_OVERFLOW


def test_message_overflow_matches_indegree(spark, webmap_edges):
    """The golden IS clones * indegree — cross-check with a tiny clone
    count so the collect_list path is verified independently of the
    fixture constants."""
    from pyspark.sql import functions as F

    got = {r["id"]: r["value"] for r in message_overflow_demo(webmap_edges, clones=3).collect()}
    indeg = {
        r["dst"]: r["n"]
        for r in webmap_edges.groupBy("dst").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {v: 3 * indeg.get(v, 0) for v in got}
    assert got == want


def test_pagerank_struct_golden(spark, webmap_edges):
    """Composite vertex value (PageRankVertex2 StateWritable): ranks
    match the PageRankReal2 golden (same as PageRankReal, maxIter=10),
    and the identifier field rides the struct unchanged."""
    from linkgraph import pagerank_struct_demo

    got, _ = pagerank_struct_demo(webmap_edges, fixed_updates=9)
    rows = {r["id"]: (r["rank"], r["identifier"]) for r in got.collect()}
    # expected/PageRankReal2/part-0 line 1
    assert abs(rows[0][0] - 0.008290140026154316) < 1e-12
    assert all(ident == f"vertex-{i}" for i, (_, ident) in rows.items())


def test_pagerank_nocombiner_golden(spark, webmap_edges):
    """expected/PageRankRealNoCombiner (== expected/PageRankRealDynamic
    within the reference's own 1e-7 float tolerance — both differ from
    PageRankReal only in last-ulp summation order): PageRank through the
    DefaultMessageCombiner path (DefaultMessageCombiner.java:25-72, no
    combining — messages concatenate into a list and the vertex sums
    them), written against the public VertexProgram API with
    combine_agg=collect_list."""
    from linkgraph import VertexProgram, run_vertex_program
    from pyspark.sql import functions as F
    from tests.test_algorithms import GOLDEN_PR

    n, d = 20, 0.85
    prog = VertexProgram(
        init_expr=F.lit(1.0 / n),
        message_expr=F.col("value") / F.col("outdeg"),
        combine_agg=F.collect_list("msg"),
        update_expr=F.lit((1 - d) / n)
        + F.lit(d)
        * F.coalesce(
            F.expr("aggregate(msg, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"),
            F.lit(0.0),
        ),
        plan="outer",
    )
    state, _ = run_vertex_program(
        webmap_edges, prog, max_supersteps=9, stop_when=lambda s: False
    )
    got = {r["id"]: r["value"] for r in state.collect()}
    assert set(got) == set(GOLDEN_PR)
    for v, exp in GOLDEN_PR.items():
        assert abs(got[v] - exp) < 1e-7


def test_shortest_paths_generated_ring_golden(spark):
    """expected/ShortestPaths (the generated-graph job,
    JobGenerator.java:212-224 + SimulatedPageRankVertexReader,
    PageRankVertex.java:150-185): ring i -> (i+1) % 40 with edge weight
    100*i, source 0 — golden distance d(k) = sum_{i<k} 100*i
    = 50*k*(k-1), transcribed from expected/ShortestPaths/part-0..3."""
    from pyspark.sql import functions as F

    from linkgraph import shortest_paths
    from linkgraph.sources import ring_graph

    n = 40
    edges = ring_graph(spark, n).withColumn(
        "w", (F.col("src") * 100).cast("double")
    )
    dist, _ = shortest_paths(edges, source=0, weight_col="w")
    got = {r["id"]: r["distance"] for r in dist.collect()}
    assert got == {k: 50.0 * k * (k - 1) for k in range(n)}
