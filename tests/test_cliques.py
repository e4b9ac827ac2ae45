"""Maximal-clique parity: the reference MaximalCliqueAggregator's global
answer (maximum-size cliques, ascending order) on all three reference
clique fixtures, plus a pure-Python Bron-Kerbosch oracle for the local
enumeration."""

from itertools import combinations

import pytest

from linkgraph import local_maximal_cliques, maximum_cliques
from linkgraph.synth import CLIQUE, CLIQUE2, CLIQUE3, adjacency_to_edges, edges_df


def _canonical_edges(adjdict):
    """The reference's effective edge rule: edge(x, y), x<y iff x in
    adj(y) (MaximalCliqueVertex sends along u->w for w<u; the DFS edge
    check consults the larger endpoint's list)."""
    out = set()
    for u, ds in adjdict.items():
        for w in ds:
            if w < u:
                out.add((w, u))
    return out


def _all_max_cliques_oracle(adjdict):
    """Brute force: maximum cliques of the canonical-edge graph."""
    e = _canonical_edges(adjdict)
    nodes = sorted({x for p in e for x in p})
    best, size = [], 0
    for r in range(len(nodes), 1, -1):
        for comb in combinations(nodes, r):
            if all((a, b) in e for a, b in combinations(comb, 2)):
                best.append(list(comb))
        if best:
            size = r
            break
    return sorted(best), size


@pytest.mark.parametrize(
    "adjdict,expected",
    [
        (CLIQUE, [[1, 2, 3, 4]]),
        (CLIQUE2, [[1, 2, 3], [1, 3, 4]]),
        (CLIQUE3, [[1, 2, 3, 4, 5, 6, 7, 8, 9], [11, 12, 13, 14, 15, 16, 17, 18, 19]]),
    ],
)
def test_maximum_cliques_reference(spark, adjdict, expected):
    edges = edges_df(spark, adjacency_to_edges(adjdict))
    got = sorted([list(r["clique"]) for r in maximum_cliques(edges).collect()])
    assert got == expected
    oracle, _ = _all_max_cliques_oracle(adjdict)
    assert got == oracle


def test_local_contains_all_global_maximals(spark):
    edges = edges_df(spark, adjacency_to_edges(CLIQUE2))
    local = {tuple(r["clique"]) for r in local_maximal_cliques(edges).collect()}
    # {3,5} is globally maximal with min vertex 3; must appear
    assert (3, 5) in local
    assert (1, 2, 3) in local and (1, 3, 4) in local
