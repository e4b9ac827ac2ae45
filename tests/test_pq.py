"""Product-quantization ADC top-k (pipeline/similarity.pq_topk)."""

import numpy as np


def _vecs(n, dim, seed=7):
    """Deterministic synthetic embeddings (no RNG state dependence)."""
    i = np.arange(n)[:, None]
    j = np.arange(dim)[None, :]
    return np.sin(0.7 * i + 1.3 * j + seed) + 0.01 * i


def _lloyd(x, k, iters):
    """imru.kmeans replay: init = k lowest-id rows, argmin ties lowest
    index, empty clusters keep their center, tol 1e-9 early stop."""
    c = x[:k].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = c.copy()
        for ci in range(k):
            if (a == ci).any():
                new[ci] = x[a == ci].mean(axis=0)
        if np.abs(new - c).sum() <= 1e-9:
            c = new
            break
        c = new
    return c


def _brute_pq(x, m, ks, iters, k, round_to):
    n, dim = x.shape
    sub = dim // m
    books = [_lloyd(x[:, s * sub : (s + 1) * sub], ks, iters) for s in range(m)]
    codes = np.stack(
        [
            ((x[:, s * sub : (s + 1) * sub][:, None, :] - books[s][None, :, :]) ** 2)
            .sum(axis=2)
            .argmin(axis=1)
            for s in range(m)
        ],
        axis=1,
    )
    out = {}
    for qid in range(n):
        dt = [
            ((books[s] - x[qid, s * sub : (s + 1) * sub][None, :]) ** 2).sum(axis=1)
            for s in range(m)
        ]
        dists = []
        for v in range(n):
            if v == qid:
                continue
            d = round(sum(dt[s][codes[v, s]] for s in range(m)), round_to)
            dists.append((d, v))
        dists.sort()
        out[qid] = [(v, d) for d, v in dists[:k]]
    return out


class TestPQ:
    def test_matches_numpy_replay(self, spark):
        from linkgraph.pipeline.similarity import pq_topk

        n, dim, m, ks, iters, k = 30, 8, 2, 4, 3, 5
        x = _vecs(n, dim)
        df = spark.createDataFrame(
            [(i, [float(v) for v in x[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        # float32 storage: replay from the float32-rounded values
        x32 = x.astype(np.float32).astype(np.float64)
        exp = _brute_pq(x32, m, ks, iters, k, 6)
        got = {}
        rows = pq_topk(df, k=k, m=m, ks=ks, kmeans_iterations=iters).collect()
        for r in rows:
            got.setdefault(r["qid"], []).append((r["vec_id"], r["dist"]))
        for qid in got:
            got[qid].sort(key=lambda t: (t[1], t[0]))
        assert set(got) == set(exp)
        for qid in exp:
            assert [v for v, _ in got[qid]] == [v for v, _ in exp[qid]], qid
            for (gv, gd), (ev, ed) in zip(got[qid], exp[qid]):
                assert abs(gd - ed) < 1e-9

    def test_rejects_indivisible_dim(self, spark):
        from linkgraph.pipeline.similarity import pq_topk

        df = spark.createDataFrame(
            [(0, [0.0, 1.0, 2.0])], "vec_id long, embedding array<float>"
        )
        try:
            pq_topk(df, m=2)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    def test_pq_distance_orders_like_true_distance(self, spark):
        """Sanity: with well-separated clusters, PQ top-1 lands in the
        query's own cluster (compression preserves coarse geometry)."""
        from linkgraph.pipeline.similarity import pq_topk

        base = np.zeros((20, 8))
        base[10:, :] += 100.0  # two far-apart groups
        base += _vecs(20, 8) * 0.1
        df = spark.createDataFrame(
            [(i, [float(v) for v in base[i]]) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
        rows = pq_topk(df, k=1, m=2, ks=4, kmeans_iterations=3).collect()
        for r in rows:
            assert (r["qid"] < 10) == (r["vec_id"] < 10)
