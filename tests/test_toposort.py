"""Dependency levels (algorithms/toposort.py): hand-checked DAG
layering, cyclic-residue detection, simulator parity on random
directed graphs, self-loops, isolated vertices."""

import random

from linkgraph.algorithms.toposort import dependency_levels


def _df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _simulate(edges, extra_verts=()):
    es = set(edges)
    verts = sorted({v for e in es for v in e} | set(extra_verts))
    level = {v: -1 for v in verts}
    k = 0
    while True:
        live = {v for v in verts if level[v] == -1}
        hasin = {d for s, d in es if s in live and d in live}
        newly = live - hasin
        if not newly:
            return level
        for v in newly:
            level[v] = k
        k += 1


class TestDependencyLevels:
    def test_dag_layering(self, spark):
        # diamond + tail: 0 -> {1,2} -> 3 -> 4
        edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
        out_df, res = dependency_levels(_df(spark, edges))
        out = {r["id"]: r["level"] for r in out_df.collect()}
        assert res.converged
        assert out == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}

    def test_cycle_residue(self, spark):
        # 0 -> 1 -> (2 <-> 3) -> 4: the cycle and its descendant are -1
        edges = [(0, 1), (1, 2), (2, 3), (3, 2), (3, 4)]
        out_df, res = dependency_levels(_df(spark, edges))
        out = {r["id"]: r["level"] for r in out_df.collect()}
        assert res.converged
        assert out == {0: 0, 1: 1, 2: -1, 3: -1, 4: -1}
        assert out == _simulate(edges)

    def test_selfloop_and_isolated(self, spark):
        verts = spark.createDataFrame([(i,) for i in range(5)], "id long")
        edges = [(0, 0), (0, 1)]
        out_df, res = dependency_levels(_df(spark, edges), vertices=verts)
        out = {r["id"]: r["level"] for r in out_df.collect()}
        assert res.converged
        assert out[0] == -1 and out[1] == -1  # self-loop poisons downstream
        for v in (2, 3, 4):
            assert out[v] == 0  # isolated: sources immediately

    def test_simulator_parity_random(self, spark):
        rng = random.Random(23)
        edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(90)})
        out_df, res = dependency_levels(_df(spark, edges))
        out = {r["id"]: r["level"] for r in out_df.collect()}
        assert res.converged
        assert out == _simulate(edges)
