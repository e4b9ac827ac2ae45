"""Multi-level Louvain (algorithms/louvain.louvain_multilevel)."""

import itertools


def _sym(edges):
    s = {(a, b) for a, b in edges if a != b}
    s |= {(b, a) for a, b in s}
    return [(a, b, 1) for a, b in s]


def _move_brute(wsym, lab, two_m, rounds):
    verts = sorted(lab)
    deg = {}
    for s, d, w in wsym:
        deg[s] = deg.get(s, 0) + w
    for r in range(rounds):
        vol = {}
        for v in verts:
            c = lab[v]
            vol[c] = vol.get(c, 0) + deg.get(v, 0)
        evc = {}
        for s, d, w in wsym:
            if s == d:
                continue
            key = (s, lab[d])
            evc[key] = evc.get(key, 0) + w
        new = dict(lab)
        for v in verts:
            a = lab[v]
            kv = deg.get(v, 0)
            vol_rest = vol.get(a, 0) - kv
            e_a = evc.get((v, a), 0)
            cands = [
                (c2, e)
                for (vv, c2), e in evc.items()
                if vv == v and ((c2 < a) if r % 2 == 0 else (c2 > a))
            ]
            best = None
            for c2, e in cands:
                score = two_m * (e - e_a) - kv * (vol.get(c2, 0) - vol_rest)
                key = (score, -c2 if r % 2 == 0 else c2)
                if best is None or key > best[0]:
                    best = (key, c2, score)
            if best is not None and best[2] > 0:
                new[v] = best[1]
        lab = new
    return lab


def _multilevel_brute(edges, levels, rounds):
    wsym = _sym(edges)
    verts = sorted({v for e in edges for v in e})
    two_m = sum(w for _, _, w in wsym)
    flat = {v: v for v in verts}
    history = {}
    for lvl in range(1, levels + 1):
        supers = sorted(set(flat.values()))
        lab = _move_brute(wsym, {s: s for s in supers}, two_m, rounds)
        flat = {v: lab[flat[v]] for v in verts}
        history[lvl] = dict(flat)
        if lvl < levels:
            agg = {}
            for s, d, w in wsym:
                key = (lab[s], lab[d])
                agg[key] = agg.get(key, 0) + w
            wsym = [(a, b, w) for (a, b), w in agg.items()]
    return history


# two 4-cliques bridged by one edge, plus a pendant
CLIQUES = (
    list(itertools.combinations(range(4), 2))
    + list(itertools.combinations(range(4, 8), 2))
    + [(3, 4), (8, 0)]
)


class TestLouvainMultilevel:
    def test_matches_bruteforce_two_levels(self, spark):
        from linkgraph.algorithms.louvain import louvain_multilevel

        e = spark.createDataFrame(CLIQUES, "src long, dst long")
        got = louvain_multilevel(e, levels=2, rounds=4)
        exp = _multilevel_brute(CLIQUES, 2, 4)
        rows = {r["id"]: (r["c1"], r["c2"], r["community"]) for r in got.collect()}
        for v in exp[1]:
            assert rows[v] == (exp[1][v], exp[2][v], exp[2][v]), v

    def test_cliques_collapse(self, spark):
        from linkgraph.algorithms.louvain import louvain_multilevel

        e = spark.createDataFrame(CLIQUES, "src long, dst long")
        got = louvain_multilevel(e, levels=2, rounds=4)
        lab = {r["id"]: r["community"] for r in got.collect()}
        # each clique ends in one community; the bridge does not merge them
        assert len({lab[v] for v in range(4)}) == 1
        assert len({lab[v] for v in range(4, 8)}) == 1
        assert lab[0] != lab[4]

    def test_level1_equals_one_level_operator(self, spark):
        from linkgraph.algorithms.louvain import (
            greedy_modularity_communities,
            louvain_multilevel,
        )

        e = spark.createDataFrame(CLIQUES, "src long, dst long")
        ml = {
            r["id"]: r["c1"]
            for r in louvain_multilevel(e, levels=1, rounds=4).collect()
        }
        one = {
            r["id"]: r["community"]
            for r in greedy_modularity_communities(e, rounds=4).collect()
        }
        assert ml == one

    def test_rejects_zero_levels(self, spark):
        from linkgraph.algorithms.louvain import louvain_multilevel

        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        try:
            louvain_multilevel(e, levels=0)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestHierarchyQuality:
    def test_level2_modularity_not_worse(self, spark):
        """The contraction level exists to IMPROVE the objective:
        on the clique fixture level-2 modularity must be >= level-1
        (greedy moves on the contracted graph only take positive-gain
        merges, and level-1 labels are a feasible level-2 state)."""
        from linkgraph.algorithms.louvain import louvain_multilevel
        from linkgraph.algorithms.stats import modularity
        from pyspark.sql import functions as F

        e = spark.createDataFrame(CLIQUES, "src long, dst long")
        got = louvain_multilevel(e, levels=2, rounds=4)

        def q(col):
            labs = got.select("id", F.col(col).alias("label"))
            return modularity(e, labs).collect()[0]["modularity"]

        assert q("c2") >= q("c1") - 1e-12


class TestWeightedLouvain:
    def test_weight_beats_count(self, spark):
        """Weighted modularity: vertex 0 sits between community {0,1}
        (one heavy edge) and {2,3} (two light edges). Unweighted moves
        see 0-1 and 0-2/0-3 as comparable; weighted moves must pull 0
        toward the heavy partner."""
        from linkgraph.algorithms.louvain import greedy_modularity_communities

        edges = [
            (0, 1, 10),          # heavy pair
            (0, 2, 1), (0, 3, 1),
            (2, 3, 10),          # the light partners are their own pair
            (4, 5, 10),          # control pair far away
            (1, 4, 1),
        ]
        e = spark.createDataFrame(edges, "src long, dst long, weight long")
        lab = {
            r["id"]: r["community"]
            for r in greedy_modularity_communities(
                e, rounds=4, weight_col="weight"
            ).collect()
        }
        assert lab[0] == lab[1]
        assert lab[2] == lab[3]
        assert lab[4] == lab[5]
        assert lab[0] != lab[2] and lab[0] != lab[4]

    def test_both_orientations_sum(self, spark):
        """(a->b, 3) + (b->a, 4) is one undirected weight-7 pair."""
        from linkgraph.algorithms.louvain import _weighted_sym

        e = spark.createDataFrame(
            [(0, 1, 3), (1, 0, 4), (1, 2, 5)], "src long, dst long, weight long"
        )
        rows = {(r["src"], r["dst"]): r["w"] for r in _weighted_sym(e, "weight").collect()}
        assert rows == {(0, 1): 7, (1, 0): 7, (1, 2): 5, (2, 1): 5}
