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


def test_avg_neighbor_degree_star(spark):
    from linkgraph import avg_neighbor_degree

    # star 0-{1,2,3}: hub degree 3 (leaf nbrs deg 1), leaves degree 1
    star = [(0, 1), (0, 2), (0, 3)]
    rows = {
        r["degree"]: r
        for r in avg_neighbor_degree(
            spark.createDataFrame(star, "src long, dst long")
        ).collect()
    }
    assert rows[3]["n_vertices"] == 1 and rows[3]["avg_neighbor_degree"] == 1.0
    assert rows[1]["n_vertices"] == 3 and rows[1]["avg_neighbor_degree"] == 3.0


def test_avg_neighbor_degree_matches_bruteforce(spark):
    import random
    from collections import defaultdict

    from linkgraph import avg_neighbor_degree

    rng = random.Random(3)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(50)})
    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    by_deg = defaultdict(lambda: [0, 0, set()])
    for v, ns in nbrs.items():
        k = len(ns)
        by_deg[k][0] += sum(len(nbrs[u]) for u in ns)
        by_deg[k][1] += len(ns)
        by_deg[k][2].add(v)
    got = {
        r["degree"]: (r["n_vertices"], r["avg_neighbor_degree"])
        for r in avg_neighbor_degree(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    for k, (snd, m, vs) in by_deg.items():
        assert got[k] == (len(vs), snd / m), k


def test_rich_club_profile_hub_clique(spark):
    from linkgraph import rich_club_profile

    # triangle of hubs {0,1,2} plus a pendant leaf on each hub:
    # degree(hubs)=3, degree(leaves)=1
    edges = [(0, 1), (1, 2), (0, 2), (0, 10), (1, 11), (2, 12)]
    rows = {
        r["k"]: r
        for r in rich_club_profile(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    # k=0: all 6 vertices, 6 edges -> phi = 12/(6*5)
    assert rows[0]["n_club"] == 6 and rows[0]["e_club"] == 6
    assert rows[0]["phi"] == 2.0 * 6 / (6 * 5)
    # k=1,2: hubs only (degree>k means >1 / >2 -> degree-3 hubs), all
    # 3 hub-hub edges survive (min endpoint degree 3 > k): phi = 1
    for k in (1, 2):
        assert rows[k]["n_club"] == 3 and rows[k]["e_club"] == 3
        assert rows[k]["phi"] == 1.0
    # k=3: nobody has degree > 3 -> filtered (n_club < 2)
    assert 3 not in rows


def test_modularity_two_triangles(spark):
    from linkgraph import modularity

    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(edges, "src long, dst long")
    # perfect split: Q = 1 - sum(d_c^2)/(4 m^2) = 1 - 72/144 = 0.5
    lab = spark.createDataFrame(
        [(v, v // 10) for v in (0, 1, 2, 10, 11, 12)], "id long, label long"
    )
    row = modularity(e, lab).collect()[0]
    assert row.n_communities == 2
    assert row.m_edges == 6 and row.within_edges == 6
    assert row.sum_deg_sq == 72
    assert row.modularity == 0.5
    # everything in one community: Q = 1 - 144/144 = 0
    one = spark.createDataFrame(
        [(v, 0) for v in (0, 1, 2, 10, 11, 12)], "id long, label long"
    )
    assert modularity(e, one).collect()[0].modularity == 0.0
    # anti-communities (each edge crosses): within = 0, Q < 0
    bad = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2), (10, 0), (11, 1), (12, 2)], "id long, label long"
    )
    row_b = modularity(e, bad).collect()[0]
    assert row_b.within_edges == 0 and row_b.modularity < 0
