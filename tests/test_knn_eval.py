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
