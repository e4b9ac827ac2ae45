"""Link-prediction AUC (pipeline/embed_eval.py): brute-force
Mann-Whitney parity with controlled embeddings, tie handling,
perfect-separation sanity, and negative-sample correctness."""

import random

from linkgraph.pipeline.embed_eval import NEG_A, NEG_B, linkpred_auc, negative_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _emb(spark, vecs):
    rows = [
        (v, side, d, int(val))
        for v, vec in vecs.items()
        for side in ("in",)
        for d, val in enumerate(vec)
    ]
    return spark.createDataFrame(rows, "vertex long, side string, dim int, value long")


def _verts(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "id long")


def _brute_auc(vecs, pos, neg):
    def dot(p):
        a, b = vecs[p[0]], vecs[p[1]]
        return sum(x * y for x, y in zip(a, b))

    ps, ns = [dot(p) for p in pos], [dot(p) for p in neg]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in ps for n in ns)
    return wins / (len(ps) * len(ns))


def _expected_negs(edges, n):
    canon_e = {(min(s, d), max(s, d)) for s, d in edges}
    out = set()
    for a in range(n):
        b = (a * NEG_A + NEG_B) % n
        if a != b:
            p = (min(a, b), max(a, b))
            if p not in canon_e:
                out.add(p)
    return out


class TestEmbedEval:
    def test_negative_sample_rule(self, spark):
        edges = [(0, 1), (2, 3), (4, 0)]
        n = 10
        got = {
            (r["u"], r["v"])
            for r in negative_pairs(_edges(spark, edges), _verts(spark, n), n).collect()
        }
        assert got == _expected_negs(edges, n)

    def test_brute_force_parity_with_ties(self, spark):
        rng = random.Random(21)
        n = 12
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(18)})
        edges = [(s, d) for s, d in edges if s != d]
        # tiny integer vectors force score ties
        vecs = {v: [rng.randrange(-2, 3) for _ in range(3)] for v in range(n)}
        out = linkpred_auc(
            _emb(spark, vecs), _edges(spark, edges), _verts(spark, n), n
        ).collect()[0]
        pos = {(min(s, d), max(s, d)) for s, d in edges}
        neg = _expected_negs(edges, n)
        exp = _brute_auc(vecs, sorted(pos), sorted(neg))
        assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
        assert abs(out["auc"] - exp) < 1e-12
        # u2 is the exact integer numerator
        assert out["u2"] == round(exp * 2 * len(pos) * len(neg))

    def test_perfect_separation(self, spark):
        # each edge pair shares a private axis; every cross pair is
        # (near-)orthogonal, so positives strictly dominate
        edges = [(0, 1), (2, 3)]
        vecs = {0: [100, 0, 0], 1: [100, 0, 0], 2: [0, 100, 0], 3: [0, 100, 0]}
        n = 8
        for v in range(n):
            vecs.setdefault(v, [0, 0, 1])
        out = linkpred_auc(
            _emb(spark, vecs), _edges(spark, edges), _verts(spark, n), n
        ).collect()[0]
        assert out["auc"] == 1.0
