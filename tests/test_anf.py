"""Neighborhood function (HyperANF-style FM sketch union) tests."""

import pytest

from linkgraph.algorithms.anf import neighborhood_function


def _exact_nh(edges, vertices, max_h):
    """Exact N(h) = number of (u, v) pairs with dist(u, v) <= h
    (including u = v), undirected."""
    from collections import deque

    nbrs = {v: set() for v in vertices}
    for s, d in edges:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    out = {h: 0 for h in range(1, max_h + 1)}
    for v in vertices:
        dist = {v: 0}
        q = deque([v])
        while q:
            u = q.popleft()
            if dist[u] >= max_h:
                continue
            for w in nbrs.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for h in range(1, max_h + 1):
            out[h] += sum(1 for d in dist.values() if d <= h)
    return out


class TestNeighborhoodFunction:
    def test_estimates_track_exact_counts(self, spark):
        import random

        rng = random.Random(17)
        edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(90)})
        verts = sorted({v for e in edges for v in e})
        e = spark.createDataFrame(edges, "src long, dst long")
        out, res = neighborhood_function(e, num_maps=64, max_h=5, portable=True)
        got = {r["h"]: r["n_reachable_est"] for r in out.collect()}
        exact = _exact_nh(edges, verts, 5)
        for h in range(1, 6):
            # FM with 64 maps: std error ~10%; allow 25%
            assert abs(got[h] - exact[h]) / exact[h] < 0.25, (h, got[h], exact[h])
        # N(h) is monotone nondecreasing
        assert all(got[h] <= got[h + 1] + 1e-9 for h in range(1, 5))

    def test_early_stop_fills_fixpoint_rows(self, spark):
        e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
        out, res = neighborhood_function(e, num_maps=16, max_h=7, portable=True)
        rows = {r["h"]: (r["sum_rank"], r["n_reachable_est"]) for r in out.collect()}
        assert len(rows) == 7 and res.converged
        # diameter 2: everything from h >= 2 is the fixpoint row
        assert rows[3] == rows[2] == rows[7]
        assert res.supersteps <= 4  # ball complete at 2, detected by 3

    def test_fast_and_portable_modes_same_shape(self, spark):
        e = spark.createDataFrame([(i, i + 1) for i in range(6)], "src long, dst long")
        for portable in (True, False):
            out, _ = neighborhood_function(
                e, num_maps=8, max_h=3, portable=portable
            )
            rows = out.orderBy("h").collect()
            assert [r["h"] for r in rows] == [1, 2, 3]
            assert all(r["sum_rank"] > 0 for r in rows)

    def test_sketch_state_has_k_registers(self, spark):
        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        _, res = neighborhood_function(e, num_maps=4, max_h=2, portable=True)
        assert [c for c in res.state.columns if c.startswith("s")] == [
            "s0", "s1", "s2", "s3"
        ]


class TestEffectiveDiameter:
    def test_path_graph(self, spark):
        from linkgraph.algorithms.anf import effective_diameter

        e = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "src long, dst long"
        )
        nh, _ = neighborhood_function(e, num_maps=64, max_h=10, portable=True)
        d = effective_diameter(nh)
        # exact 90%-effective diameter of a 10-vertex path is ~6.9
        assert 5.0 <= d <= 8.5

    def test_clique_is_one(self, spark):
        from linkgraph.algorithms.anf import effective_diameter

        edges = [(i, j) for i in range(6) for j in range(i + 1, 6)]
        e = spark.createDataFrame(edges, "src long, dst long")
        nh, _ = neighborhood_function(e, num_maps=32, max_h=4, portable=True)
        assert effective_diameter(nh) <= 1.0


class TestEffectiveDiameterDF:
    def test_matches_float_helper(self, spark):
        """The engine-side one-row variant must reproduce the driver
        helper's selection (same target, same interpolation) on a
        non-trivial graph."""
        from linkgraph.algorithms.anf import (
            effective_diameter,
            effective_diameter_df,
        )

        e = spark.createDataFrame(
            [(i, i + 1) for i in range(9)] + [(0, 5)], "src long, dst long"
        )
        nh, _ = neighborhood_function(e, num_maps=32, max_h=8, portable=True)
        nh = nh.cache()
        want = effective_diameter(nh, quantile=0.9)
        row = effective_diameter_df(nh, quantile=0.9).collect()[0]
        assert row["quantile"] == 0.9
        assert abs(row["effective_diameter"] - want) < 1e-6

    def test_flat_segment_returns_prev_depth(self, spark):
        """When N(h) plateaus at the target before the straddle (clique:
        N(1) = N(2) = everything), the interpolation degenerates and the
        DF variant must return the earlier depth, like the helper."""
        from linkgraph.algorithms.anf import (
            effective_diameter,
            effective_diameter_df,
        )

        edges = [(i, j) for i in range(6) for j in range(i + 1, 6)]
        e = spark.createDataFrame(edges, "src long, dst long")
        nh, _ = neighborhood_function(e, num_maps=32, max_h=4, portable=True)
        nh = nh.cache()
        got = effective_diameter_df(nh).collect()[0]["effective_diameter"]
        assert abs(got - effective_diameter(nh)) < 1e-6
        assert got <= 1.0
