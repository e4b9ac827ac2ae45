"""One-level Louvain (algorithms/louvain.py): hand-checked community
merges, exact parity with a Python simulator of the identical
synchronous rule, determinism, and isolated-vertex handling."""

import random

from linkgraph.algorithms.louvain import greedy_modularity_communities


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _sym(edges):
    s = set()
    for a, b in edges:
        if a != b:
            s.add((a, b))
            s.add((b, a))
    return s


def _simulate(edges, rounds):
    """The exact rule incl. the alternating-direction mitigation:
    even rounds only moves to LOWER community ids (ties to smallest),
    odd rounds only to HIGHER (ties to largest); move iff score > 0
    with score(c) = 2m(e_vc - e_va') - deg_v(vol_c - vol_a')."""
    sym = _sym(edges)
    verts = sorted({a for a, _ in sym} | {v for e in edges for v in e})
    adj = {v: set() for v in verts}
    for a, b in sym:
        adj[a].add(b)
    deg = {v: len(adj[v]) for v in verts}
    two_m = len(sym)
    lab = {v: v for v in verts}
    for rnd in range(rounds):
        vol = {}
        for v in verts:
            vol[lab[v]] = vol.get(lab[v], 0) + deg[v]
        new = {}
        for v in verts:
            evc = {}
            for n in adj[v]:
                evc[lab[n]] = evc.get(lab[n], 0) + 1
            a = lab[v]
            e_a = evc.get(a, 0)
            vol_rest = vol.get(a, 0) - deg[v]
            best = None
            for c2, e in sorted(evc.items()):
                if (c2 >= a) if rnd % 2 == 0 else (c2 <= a):
                    continue
                score = two_m * (e - e_a) - deg[v] * (vol[c2] - vol_rest)
                better_tie = best is not None and score == best[0] and (
                    c2 < best[1] if rnd % 2 == 0 else c2 > best[1]
                )
                if best is None or score > best[0] or better_tie:
                    best = (score, c2)
            new[v] = best[1] if best and best[0] > 0 else a
        lab = new
    return lab


class TestLouvain:
    def test_two_triangles_bridge(self, spark):
        # two triangles joined by one bridge edge: each triangle should
        # collapse to one community, and the communities stay distinct
        edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
        out = {
            r["id"]: r["community"]
            for r in greedy_modularity_communities(_df(spark, edges), rounds=3).collect()
        }
        assert out == _simulate(edges, 3)
        assert out[0] == out[1] == out[2]
        assert out[3] == out[4] == out[5]
        assert out[0] != out[3]

    def test_simulator_parity_random(self, spark):
        rng = random.Random(17)
        edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
        edges = [(s, d) for s, d in edges if s != d]
        for rounds in (1, 3):
            out = {
                r["id"]: r["community"]
                for r in greedy_modularity_communities(
                    _df(spark, edges), rounds=rounds
                ).collect()
            }
            assert out == _simulate(edges, rounds)

    def test_isolated_vertices_keep_singletons(self, spark):
        verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
        edges = [(0, 1), (1, 2)]
        out = {
            r["id"]: r["community"]
            for r in greedy_modularity_communities(
                _df(spark, edges), rounds=2, vertices=verts
            ).collect()
        }
        for v in (5, 6, 7):
            assert out[v] == v
        assert len(out) == 8


class TestWeightContract:
    def test_fractional_weights_rejected(self, spark):
        """ADVICE r3: DOUBLE weights used to be silently truncated by a
        cast to long; the exact-gain contract requires integer weights,
        so fractional input must raise."""
        import pytest

        from linkgraph.algorithms.louvain import greedy_modularity_communities as louvain_communities

        e = spark.createDataFrame(
            [(0, 1, 0.5), (1, 2, 2.0)], "src long, dst long, w double"
        )
        with pytest.raises(ValueError, match="integer edge weights"):
            louvain_communities(e, weight_col="w")

    def test_integral_doubles_accepted(self, spark):
        from linkgraph.algorithms.louvain import greedy_modularity_communities as louvain_communities

        e = spark.createDataFrame(
            [(0, 1, 2.0), (1, 2, 3.0), (3, 4, 1.0)],
            "src long, dst long, w double",
        )
        lab = {r["id"]: r["community"]
               for r in louvain_communities(e, weight_col="w").collect()}
        # integral doubles are accepted (no raise) and cover all vertices;
        # the disconnected pair can never share the triangle's community
        assert set(lab) == {0, 1, 2, 3, 4}
        assert lab[3] not in {lab[0], lab[1], lab[2]}
        assert lab[4] not in {lab[0], lab[1], lab[2]}

    def test_input_self_loops_ignored_unweighted(self, spark):
        """Raw input self-loops must not perturb 2m in the unweighted
        path (the 2x-self-row convention is contraction-only)."""
        from linkgraph.algorithms.louvain import greedy_modularity_communities as louvain_communities

        base = [(0, 1), (1, 2), (0, 2)]
        e1 = spark.createDataFrame(base, "src long, dst long")
        e2 = spark.createDataFrame(
            base + [(0, 0), (1, 1)], "src long, dst long"
        )
        l1 = {r["id"]: r["community"] for r in louvain_communities(e1).collect()}
        l2 = {r["id"]: r["community"] for r in louvain_communities(e2).collect()}
        assert l1 == l2
