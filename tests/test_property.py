"""Property-based testing (hypothesis): random small digraphs checked
against pure-Python oracles — union-find for components, power
iteration for PageRank, brute-force BFS for SSSP. Goes beyond the
reference's fixture-only strategy (SURVEY.md §7: "no randomized/
property-based testing" there)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkgraph import connected_components, pagerank, shortest_paths
from linkgraph.synth import edges_df

N_MAX = 12

edge_lists = st.lists(
    st.tuples(st.integers(0, N_MAX - 1), st.integers(0, N_MAX - 1)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=30,
    unique=True,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _union_find_components(edges):
    nodes = sorted({x for e in edges for x in e})
    parent = {v: v for v in nodes}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in nodes}


def _power_iteration(edges, tol=1e-6, max_iter=100):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {v: [] for v in nodes}
    for a, b in edges:
        out[a].append(b)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        msgs = {v: 0.0 for v in nodes}
        for v in nodes:
            if out[v]:
                w = r[v] / len(out[v])
                for d in out[v]:
                    msgs[d] += w
        new = {v: 0.15 / n + 0.85 * msgs[v] for v in nodes}
        delta = sum(abs(new[v] - r[v]) for v in nodes)
        r = new
        if delta <= tol:
            break
    return r


def _bfs_dist(edges, source):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    nodes = {x for e in edges for x in e}
    dist = {source: 0.0}
    frontier = [source]
    while frontier:
        nxt = []
        for v in frontier:
            for w in adj.get(v, []):
                if w not in dist:
                    dist[w] = dist[v] + 1.0
                    nxt.append(w)
        frontier = nxt
    return {v: dist.get(v) for v in nodes}


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_cc_matches_union_find(spark, edges):
    comp, _ = connected_components(edges_df(spark, edges))
    got = {r["id"]: r["component"] for r in comp.collect()}
    assert got == _union_find_components(edges)


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_pagerank_matches_power_iteration(spark, edges):
    ranks, res = pagerank(edges_df(spark, edges), tol=1e-6)
    exp = _power_iteration(edges)
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert set(got) == set(exp)
    for v in exp:
        assert math.isclose(got[v], exp[v], abs_tol=2e-6)


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_sssp_matches_bfs(spark, edges):
    source = min(x for e in edges for x in e)
    dist, _ = shortest_paths(edges_df(spark, edges), source=source)
    got = {r["id"]: r["distance"] for r in dist.collect()}
    assert got == _bfs_dist(edges, source)
