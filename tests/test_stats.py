"""graph_summary (algorithms/stats.py) against hand-computed values."""

import math

from linkgraph.algorithms.stats import graph_summary


def test_graph_summary_known_graph(spark):
    # triangle 0-1-2 (one reciprocal pair 0<->1), pendant 2->3
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = graph_summary(df).collect()[0]
    assert row.n_vertices == 4
    assert row.n_edges == 5
    assert row.n_undirected == 4  # {0,1},{1,2},{0,2},{2,3}
    assert row.reciprocity == 0.4  # 2 of 5 directed edges reciprocated
    assert row.max_out_degree == 2
    assert row.avg_out_degree == 1.25
    assert row.density == round(4 / 6, 6)
    # undirected degrees: 0:2 1:2 2:3 3:1 — Pearson over the 8
    # directed listings of the 4 undirected edges
    xs = [(2, 2), (2, 3), (3, 2), (2, 3), (3, 2), (2, 2), (3, 1), (1, 3)]
    m = len(xs)
    sx = sum(x for x, _ in xs)
    sxx = sum(x * x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    want = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert row.assortativity == round(want, 6)


def test_graph_summary_regular_graph_null_assortativity(spark):
    # 4-cycle: every vertex degree 2 -> zero variance -> NULL
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    row = graph_summary(spark.createDataFrame(cyc, "src long, dst long")).collect()[0]
    assert row.assortativity is None
    assert row.reciprocity == 0.0
    assert row.n_undirected == 4


def test_graph_summary_duplicate_edges_ignored(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 0)], "src long, dst long"
    )
    row = graph_summary(df).collect()[0]
    assert row.n_edges == 2 and row.n_undirected == 1
    assert row.reciprocity == 1.0
