"""Seeded (semi-supervised) label propagation: freeze semantics,
deterministic mode tie-break, unreachable sentinel, and frontier-plan
equivalence to a synchronous full-rescan Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph import seeded_label_propagation
from linkgraph.synth import WEBMAPCOMPLEX, adjacency_to_edges, edges_df


def _python_oracle(directed_edges, seeds, rounds=50):
    """Synchronous full-rescan reference: each round every unlabeled
    vertex takes the mode (count desc, label asc) over ALL labeled
    neighbors, then freezes."""
    nbrs: dict[int, set[int]] = {}
    verts = set()
    for s, d in directed_edges:
        verts.update((s, d))
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    labels = dict(seeds)
    for _ in range(rounds):
        new = {}
        for v in verts:
            if v in labels:
                continue
            counts: dict[int, int] = {}
            for u in nbrs.get(v, ()):
                if u in labels:
                    counts[labels[u]] = counts.get(labels[u], 0) + 1
            if counts:
                new[v] = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        if not new:
            break
        labels.update(new)
    return {v: labels.get(v, -1) for v in verts}


@pytest.fixture(scope="module")
def complex_edges(spark):
    return edges_df(spark, adjacency_to_edges(WEBMAPCOMPLEX)).cache()


def _run(spark, edges, seed_pairs, **kw):
    seeds = spark.createDataFrame(seed_pairs, "id LONG, label LONG")
    out, res = seeded_label_propagation(edges, seeds, **kw)
    return {r["id"]: r["label"] for r in out.collect()}, res


class TestSeededLPA:
    def test_matches_full_rescan_oracle(self, spark, complex_edges):
        raw = [(r["src"], r["dst"]) for r in complex_edges.collect()]
        ids = sorted({v for e in raw for v in e})
        seed_pairs = [(v, v % 3) for v in ids if v % 4 == 0]
        got, res = _run(spark, complex_edges, seed_pairs)
        assert res.converged
        assert got == _python_oracle(raw, dict(seed_pairs))

    def test_seeds_clamped(self, spark, complex_edges):
        # a seed surrounded by differently-labeled seeds keeps its label
        seed_pairs = [(0, 7), (1, 2), (2, 2), (3, 2)]
        got, _ = _run(spark, complex_edges, seed_pairs)
        assert got[0] == 7

    def test_unreachable_is_minus_one(self, spark):
        edges = spark.createDataFrame(
            [(0, 1), (2, 3)], "src LONG, dst LONG"
        )
        got, _ = _run(spark, edges, [(0, 9)])
        assert got == {0: 9, 1: 9, 2: -1, 3: -1}

    def test_tie_lowest_label_wins(self, spark):
        edges = spark.createDataFrame([(0, 2), (1, 2)], "src LONG, dst LONG")
        got, _ = _run(spark, edges, [(0, 5), (1, 3)])
        assert got[2] == 3

    def test_majority_beats_low_label(self, spark):
        # two label-7 neighbors outvote one label-1 neighbor
        edges = spark.createDataFrame(
            [(0, 9), (1, 9), (2, 9)], "src LONG, dst LONG"
        )
        got, _ = _run(spark, edges, [(0, 7), (1, 7), (2, 1)])
        assert got[9] == 7

    def test_layered_spread_supersteps(self, spark):
        # path 0-1-2-3-4 seeded at 0: BFS layers, 4 labeling rounds
        # (+1 fixpoint-proof round)
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4)], "src LONG, dst LONG"
        )
        got, res = _run(spark, edges, [(0, 1)])
        assert got == {i: 1 for i in range(5)}
        assert res.converged and res.supersteps <= 5
