"""Multi-job parity: the reference chains jobs over the same loaded
graph (MultiJobPageRankTest / MultiJobConnectedComponentsTest /
JobConcatenationTest — same B-tree reused across jobs). Spark analogue:
several algorithms over one cached edge DataFrame in one session, each
producing the same answer as a fresh run."""

import math

from linkgraph import connected_components, label_propagation, pagerank
from linkgraph.synth import WEBMAP, adjacency_to_edges, edges_df


class TestMultiJob:
    def test_pagerank_twice_same_result(self, webmap_edges):
        r1, _ = pagerank(webmap_edges, fixed_updates=9)
        r2, _ = pagerank(webmap_edges, fixed_updates=9)
        a = {r["id"]: r["rank"] for r in r1.collect()}
        b = {r["id"]: r["rank"] for r in r2.collect()}
        assert set(a) == set(b)
        for v in a:
            assert math.isclose(a[v], b[v], abs_tol=1e-12)

    def test_job_concatenation_pr_then_cc_then_lpa(self, webmap_edges):
        edges = webmap_edges.cache()
        ranks, pr_res = pagerank(edges, tol=1e-6)
        comps, cc_res = connected_components(edges)
        labels, lpa_res = label_propagation(edges, max_supersteps=4)
        assert pr_res.converged and cc_res.converged
        assert ranks.count() == comps.count() == labels.count() == 20
        # single undirected component on webmap
        assert comps.select("component").distinct().count() == 1
