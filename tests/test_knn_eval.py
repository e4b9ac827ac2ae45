"""kNN majority-vote label eval: independent numpy oracle on a
deterministic clustered embedding set."""

import numpy as np

from linkgraph.pipeline import knn_label_accuracy


def _synth(n=30, dim=4):
    """Three deterministic clusters around axis vectors with arithmetic
    perturbations — kNN should be near-perfect but not trivially so."""
    rows = []
    for i in range(n):
        lab = i % 3
        v = np.zeros(dim)
        v[lab] = 10.0
        for d in range(dim):
            v[d] += ((i * 31 + d * 17) % 7) - 3  # [-3, 3] arithmetic noise
        rows.append((i, [float(x) for x in v], lab))
    return rows


def _oracle(rows, k, n_queries):
    ids = [r[0] for r in rows]
    V = {r[0]: np.array(r[1]) for r in rows}
    lab = {r[0]: r[2] for r in rows}
    out = {}
    for q in ids:
        if q >= n_queries:
            continue
        sims = []
        for c in ids:
            if c == q:
                continue
            s = round(
                float(V[q] @ V[c] / (np.linalg.norm(V[q]) * np.linalg.norm(V[c]))),
                4,
            )
            sims.append((-s, c))
        knn = [c for _, c in sorted(sims)[:k]]
        votes = {}
        for c in knn:
            votes[lab[c]] = votes.get(lab[c], 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        out[q] = (pred, lab[q], int(pred == lab[q]))
    return out


class TestKnnLabelAccuracy:
    def test_matches_numpy_oracle(self, spark):
        rows = _synth()
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        got = {
            r["qid"]: (r["pred_label"], r["true_label"], r["correct"])
            for r in knn_label_accuracy(df, k=5, n_queries=12).collect()
        }
        # float32 storage: recompute the oracle on the float32-rounded
        # vectors, exactly what the engine reads back from the column
        rows32 = [
            (i, [float(np.float32(x)) for x in v], l) for i, v, l in rows
        ]
        assert got == _oracle(rows32, k=5, n_queries=12)
        assert len(got) == 12
        # the clusters are recoverable: accuracy well above chance
        assert sum(c for _, _, c in got.values()) >= 9


class TestAnnComposition:
    """knn_label_accuracy_ann + ann_recall (VERDICT r3 #4): the ANN
    candidate tiers composed with the shared majority vote."""

    def _emb(self, spark, n=48, dim=8):
        rows = _synth(n=n, dim=dim)
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label long"
        )

    def test_lsh_accuracy_on_planted_clusters(self, spark):
        from linkgraph.pipeline import knn_label_accuracy_ann

        emb = self._emb(spark)
        out = knn_label_accuracy_ann(
            emb, dim=8, k=5, n_queries=12, method="lsh"
        ).collect()
        assert len(out) == 12
        acc = sum(r["correct"] for r in out) / len(out)
        # well-separated planted clusters: the LSH candidate set must
        # preserve enough neighborhood to classify almost perfectly
        assert acc >= 0.9, acc

    def test_ivf_and_pq_run_and_vote(self, spark):
        from linkgraph.pipeline import knn_label_accuracy_ann

        emb = self._emb(spark)
        for method, kw in [
            ("ivf", dict(n_clusters=4, n_probe=2)),
            ("pq", dict(m=4, ks=4)),
        ]:
            out = knn_label_accuracy_ann(
                emb, dim=8, k=5, n_queries=6, method=method, **kw
            ).collect()
            assert len(out) == 6, method
            acc = sum(r["correct"] for r in out) / len(out)
            assert acc >= 0.5, (method, acc)

    def test_recall_bounds(self, spark):
        from linkgraph.pipeline import ann_recall

        emb = self._emb(spark)
        rows = ann_recall(
            emb, dim=8, k=5, n_queries=12, method="lsh"
        ).collect()
        assert len(rows) == 12
        assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
        assert all(r["n_exact"] == 5 for r in rows)
        mean_recall = sum(r["recall"] for r in rows) / len(rows)
        # planted clusters: same-cluster vectors share sign patterns,
        # so banded LSH must recover most of the exact top-k
        assert mean_recall >= 0.6, mean_recall

    def test_unknown_method_raises(self, spark):
        import pytest

        from linkgraph.pipeline import knn_label_accuracy_ann

        with pytest.raises(ValueError, match="lsh"):
            knn_label_accuracy_ann(
                self._emb(spark), dim=8, method="annoy"
            ).collect()


class TestSemanticDedup:
    def test_planted_paraphrase_clusters(self, spark):
        """Two tight direction-groups: within each, the near-identical
        higher-id copies drop (keep-lowest-id), distinct directions
        survive; every vector appears exactly once with its cluster."""
        from linkgraph.pipeline import semantic_dedup

        rows = [
            # group around +x: 0 and 1 are near-copies, 2 is tilted away
            (0, [10.0, 0.0, 0.0, 0.0]),
            (1, [10.0, 0.1, 0.0, 0.0]),
            (2, [3.0, 4.0, 0.0, 0.0]),
            # group around +z: 3 and 4 near-copies, 5 tilted away
            (3, [0.0, 0.0, 8.0, 0.0]),
            (4, [0.0, 0.0, 8.0, 0.1]),
            (5, [0.0, 0.0, 3.0, 4.0]),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        out = {
            r["vec_id"]: (r["cluster"], r["kept"])
            for r in semantic_dedup(
                emb, n_clusters=2, tau=0.95, kmeans_iterations=4
            ).collect()
        }
        assert len(out) == 6
        # near-copies drop, lowest id of each pair survives
        assert out[0][1] == 1 and out[1][1] == 0
        assert out[3][1] == 1 and out[4][1] == 0
        # tilted vectors are below tau vs their cluster-mates: kept
        assert out[2][1] == 1 and out[5][1] == 1
        # the two direction-groups land in different clusters
        assert out[0][0] == out[1][0] == out[2][0]
        assert out[3][0] == out[4][0] == out[5][0]
        assert out[0][0] != out[3][0]

    def test_cross_cluster_neardups_survive(self, spark):
        """The SemDeDup trade, asserted: a near-dup pair split across
        clusters is NOT pruned (candidates are cluster-local)."""
        from linkgraph.pipeline import semantic_dedup

        # k-means init = 2 lowest-id vectors -> 0 and 1 seed DIFFERENT
        # clusters even though they are near-copies
        rows = [
            (0, [10.0, 0.0]),
            (1, [10.0, 0.1]),
            (2, [0.0, 10.0]),
            (3, [0.1, 10.0]),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        out = {
            r["vec_id"]: (r["cluster"], r["kept"])
            for r in semantic_dedup(
                emb, n_clusters=2, tau=0.95, kmeans_iterations=3
            ).collect()
        }
        if out[0][0] != out[1][0]:
            assert out[0][1] == 1 and out[1][1] == 1
        else:  # if Lloyd merged them after all, the lower id survives
            assert out[0][1] == 1 and out[1][1] == 0

    def test_max_cluster_size_cap_skips_pruning(self, spark):
        """An oversized cluster skips pair generation entirely (all
        members kept) instead of going quadratic — the MinHash bucket
        cap's semantics on the embedding side."""
        from linkgraph.pipeline import semantic_dedup

        rows = [(i, [10.0, 0.01 * i]) for i in range(6)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        capped = semantic_dedup(
            emb, n_clusters=1, tau=0.9, kmeans_iterations=2,
            max_cluster_size=3,
        )
        assert all(r["kept"] == 1 for r in capped.collect())
        uncapped = semantic_dedup(
            emb, n_clusters=1, tau=0.9, kmeans_iterations=2,
            max_cluster_size=None,
        )
        assert sum(1 for r in uncapped.collect() if r["kept"] == 0) == 5
