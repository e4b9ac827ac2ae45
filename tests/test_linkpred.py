"""Link prediction (common-neighbor scores) vs a brute-force oracle."""

from __future__ import annotations

import math
from itertools import combinations

import pytest

from linkgraph import common_neighbor_scores
from linkgraph.synth import WEBMAPCOMPLEX, adjacency_to_edges, edges_df


def _python_scores(directed_edges, min_common=2, max_center_degree=None):
    nbrs: dict[int, set[int]] = {}
    for s, d in directed_edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    out = {}
    for u, v in combinations(sorted(nbrs), 2):
        if v in nbrs[u]:
            continue
        cn = nbrs[u] & nbrs[v]
        if max_center_degree is not None:
            cn = {b for b in cn if len(nbrs[b]) <= max_center_degree}
        if len(cn) < min_common:
            continue
        common = len(cn)
        out[(u, v)] = (
            common,
            common / (len(nbrs[u]) + len(nbrs[v]) - common),
            sum(1.0 / math.log(len(nbrs[b])) for b in cn),
        )
    return out


@pytest.fixture(scope="module")
def webmap_edges():
    return adjacency_to_edges(WEBMAPCOMPLEX)


class TestCommonNeighborScores:
    def test_matches_bruteforce(self, spark, webmap_edges):
        got_df = common_neighbor_scores(edges_df(spark, webmap_edges), min_common=2)
        got = {
            (r["u"], r["v"]): (r["common"], r["jaccard"], r["adamic_adar"])
            for r in got_df.collect()
        }
        exp = _python_scores(webmap_edges, min_common=2)
        assert got.keys() == exp.keys()
        for k, (c, j, a) in exp.items():
            assert got[k][0] == c
            assert got[k][1] == pytest.approx(j, abs=1e-12)
            assert got[k][2] == pytest.approx(a, abs=1e-12)

    def test_center_degree_cap(self, spark, webmap_edges):
        """The scale knob drops high-degree centers exactly — same rule
        as the brute-force oracle applying the same cap."""
        got_df = common_neighbor_scores(
            edges_df(spark, webmap_edges), min_common=1, max_center_degree=3
        )
        got = {
            (r["u"], r["v"]): r["common"] for r in got_df.collect()
        }
        exp = {
            k: c
            for k, (c, _j, _a) in _python_scores(
                webmap_edges, min_common=1, max_center_degree=3
            ).items()
        }
        assert got == exp

    def test_cli_subcommand(self, spark, webmap_edges, tmp_path):
        from linkgraph import cli

        edges_path = str(tmp_path / "edges")
        edges_df(spark, webmap_edges).write.parquet(edges_path)
        out_path = str(tmp_path / "scores")
        cli.main(
            ["linkpred", "--edges", edges_path, "--output", out_path,
             "--min-common", "2"]
        )
        got = {
            (r["u"], r["v"]): r["common"]
            for r in spark.read.parquet(out_path).collect()
        }
        exp = {
            k: c for k, (c, _j, _a) in _python_scores(webmap_edges, min_common=2).items()
        }
        assert got == exp

    def test_directed_excludes_reverse_only_adjacency(self, spark):
        """Directed mode: a pair adjacent ONLY via the reverse edge
        (v->u) must still be excluded from the non-adjacent
        predictions (advisor finding, round 2)."""
        edges = [(1, 3), (2, 3), (2, 1)]  # (1,2) share out-nbr 3; edge 2->1
        df = common_neighbor_scores(
            edges_df(spark, edges), min_common=1, symmetrize_edges=False
        )
        got = {(r["u"], r["v"]) for r in df.collect()}
        assert (1, 2) not in got
        assert got == set()

    def test_directed_deg1_center_adamic_adar_guard(self, spark):
        """Directed mode: a common out-neighbor with out-degree 1 makes
        1/ln(1) divide by zero; the guard contributes 0 to adamic_adar
        (deterministically) while the center still counts in common."""
        edges = [(1, 3), (2, 3), (3, 4)]  # center 3 has out-degree 1
        df = common_neighbor_scores(
            edges_df(spark, edges), min_common=1, symmetrize_edges=False
        )
        rows = {(r["u"], r["v"]): r for r in df.collect()}
        assert (1, 2) in rows
        r = rows[(1, 2)]
        assert r["common"] == 1
        assert r["adamic_adar"] == 0.0  # guarded, not NULL

    def test_hub_cap_default_bounds_wedge_volume(self, spark):
        """A 5000-degree hub under the default cap: hub-mediated pairs
        never materialize (the wedge join would be ~12.5M rows for one
        center), while low-degree-center pairs come through exactly."""
        hub_edges = [(0, leaf) for leaf in range(1, 5001)]
        side_edges = [(1, 6000), (2, 6000), (1, 6001), (2, 6001)]
        df = common_neighbor_scores(
            edges_df(spark, hub_edges + side_edges),
            min_common=1,
            max_center_degree=100,
        )
        rows = {(r["u"], r["v"]): r for r in df.collect()}
        # only pairs mediated by low-degree centers survive: the two
        # side centers connect (1,2); leaves 1 and 2 (degree 3) connect
        # the hub and side centers to each other. NO leaf-leaf pair
        # (their only common neighbor is the capped hub).
        assert set(rows) == {(1, 2), (0, 6000), (0, 6001), (6000, 6001)}
        assert all(r["common"] == 2 for r in rows.values())
        # (1,2)'s centers have (symmetrized) degree 2 -> 2 * 1/ln(2)
        assert rows[(1, 2)]["adamic_adar"] == pytest.approx(
            2.0 / math.log(2.0), abs=1e-12
        )
        # the others' centers are leaves 1,2 with degree 3 -> 2 * 1/ln(3)
        assert rows[(0, 6000)]["adamic_adar"] == pytest.approx(
            2.0 / math.log(3.0), abs=1e-12
        )

    def test_no_adjacent_pairs_and_ordering(self, spark, webmap_edges):
        df = common_neighbor_scores(edges_df(spark, webmap_edges), min_common=1)
        rows = df.collect()
        assert all(r["u"] < r["v"] for r in rows)
        sym = set()
        for s, d in webmap_edges:
            sym.add((s, d))
            sym.add((d, s))
        assert all((r["u"], r["v"]) not in sym for r in rows)
