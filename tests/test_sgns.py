"""Integer SGNS trainer (pipeline/sgns.py): exactness, partition
invariance, kernel-vs-naive parity, and learning direction."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pairs(spark):
    # a tiny two-community graph's skip-gram pairs: 0-1-2 and 10-11-12
    rows = [
        (0, 1, 4), (1, 0, 4), (1, 2, 4), (2, 1, 4), (0, 2, 2), (2, 0, 2),
        (10, 11, 4), (11, 10, 4), (11, 12, 4), (12, 11, 4),
        (10, 12, 2), (12, 10, 2),
    ]
    return spark.createDataFrame(rows, "center LONG, context LONG, n_pairs LONG")


def _train(pairs, **kw):
    from linkgraph.pipeline.sgns import train_sgns

    defaults = dict(dim=4, epochs=2, negatives=2, seed=11, portable=True)
    defaults.update(kw)
    return train_sgns(pairs, **defaults)


class TestSGNS:
    def test_partition_invariance(self, pairs):
        a, _ = _train(pairs)
        b, _ = _train(pairs.repartition(7))
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_production_mode_also_deterministic(self, pairs):
        a, _ = _train(pairs, portable=False)
        b, _ = _train(pairs.repartition(5), portable=False)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_kernel_matches_naive_reference(self, spark, pairs):
        """The vectorized numpy kernel == a per-example Python loop
        implementing the spec literally."""
        from linkgraph.pipeline.sgns import train_sgns

        dim, epochs, neg, seed, sb = 3, 2, 1, 11, 14
        S = 1 << sb
        out, model = train_sgns(
            pairs, dim=dim, epochs=epochs, negatives=neg, seed=seed,
            scale_bits=sb, portable=True,
        )
        vocab = model.vocab
        idx = {int(v): i for i, v in enumerate(vocab)}
        V = len(vocab)

        # rebuild init + examples through the same Spark expressions
        from linkgraph.pipeline.sgns import _coin_expr

        grid = spark.createDataFrame(
            [(int(v), j) for v in vocab for j in range(dim)], "vertex LONG, j INT"
        )
        init = grid.selectExpr(
            "vertex", "j",
            f"{_coin_expr('sgi', ['vertex', 'j'], seed, True)} % {S} - {S // 2} AS vi",
            f"{_coin_expr('sgo', ['vertex', 'j'], seed, True)} % {S} - {S // 2} AS vo",
        ).collect()
        ein = np.zeros((V, dim), dtype=np.int64)
        eout = np.zeros((V, dim), dtype=np.int64)
        for r in init:
            ein[idx[r["vertex"]], r["j"]] = r["vi"]
            eout[idx[r["vertex"]], r["j"]] = r["vo"]

        from pyspark.sql import functions as F

        ex = [(r["center"], r["context"], 1, r["n_pairs"]) for r in pairs.collect()]
        negs = pairs.withColumn(
            "m", F.explode(F.sequence(F.lit(0), F.lit(neg - 1)))
        ).selectExpr(
            "center", "n_pairs",
            f"{_coin_expr('sgn', ['center', 'context', 'm'], seed, True)} % {V} AS i"
        ).collect()
        for r in negs:
            ex.append((r["center"], int(vocab[r["i"]]), 0, r["n_pairs"]))

        lr_num, lr_den = 1, 4
        for _ in range(epochs):
            gi = np.zeros_like(ein)
            go = np.zeros_like(eout)
            for c, x, y, n in ex:
                a, b = ein[idx[c]], eout[idx[x]]
                s = int((a * b).sum())
                sigma = min(max(S // 2 + s // (4 * S), 0), S)  # python // is floor
                g = sigma - y * S
                w = -(lr_num * min(n, 1 << 15) * g)
                for j in range(dim):
                    gi[idx[c], j] += (w * int(b[j])) // (lr_den * S)
                    go[idx[x], j] += (w * int(a[j])) // (lr_den * S)
            ein = np.clip(ein + gi, -2 * S, 2 * S)
            eout = np.clip(eout + go, -2 * S, 2 * S)

        got = {(r["vertex"], r["side"], r["dim"]): r["value"] for r in out.collect()}
        for v in vocab:
            for j in range(dim):
                assert got[(int(v), "in", j)] == int(ein[idx[int(v)]][j])
                assert got[(int(v), "out", j)] == int(eout[idx[int(v)]][j])

    def test_positives_move_together(self, spark):
        """With no negatives, training must increase the in-out dot
        of an observed pair (gradient sign sanity)."""
        from linkgraph.pipeline.sgns import train_sgns

        pairs = spark.createDataFrame(
            [(0, 1, 10), (1, 0, 10)], "center LONG, context LONG, n_pairs LONG"
        )
        _, m0 = train_sgns(pairs, dim=4, epochs=1, negatives=0, portable=True)
        _, m1 = train_sgns(pairs, dim=4, epochs=6, negatives=0, portable=True)
        i0, i1 = list(m0.vocab).index(0), list(m0.vocab).index(1)
        dot0 = int((m0.emb_in[i0] * m0.emb_out[i1]).sum())
        dot1 = int((m1.emb_in[i0] * m1.emb_out[i1]).sum())
        assert dot1 > dot0

    def test_rejects_bad_params(self, pairs):
        from linkgraph.pipeline.sgns import train_sgns

        with pytest.raises(ValueError):
            train_sgns(pairs, dim=0)
        with pytest.raises(ValueError):
            train_sgns(pairs, scale_bits=40)


class TestSharded:
    """train_sgns_sharded: the model-sharded (driver-unbounded) trainer
    must be BIT-IDENTICAL to the driver-held IMRU variant."""

    def test_bit_identical_portable(self, pairs):
        from linkgraph.pipeline.sgns import train_sgns_sharded

        a, _ = _train(pairs)
        b = train_sgns_sharded(
            pairs, dim=4, epochs=2, negatives=2, seed=11, portable=True
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_bit_identical_production_hash(self, pairs):
        from linkgraph.pipeline.sgns import train_sgns_sharded

        a, _ = _train(pairs, portable=False)
        b = train_sgns_sharded(
            pairs, dim=4, epochs=2, negatives=2, seed=11, portable=False
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_partition_invariance(self, pairs):
        from linkgraph.pipeline.sgns import train_sgns_sharded

        kw = dict(dim=3, epochs=2, negatives=1, seed=7, portable=False)
        a = train_sgns_sharded(pairs, num_partitions=2, **kw)
        b = train_sgns_sharded(pairs.repartition(9), num_partitions=13, **kw)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_no_negatives(self, pairs):
        from linkgraph.pipeline.sgns import train_sgns_sharded

        a, _ = _train(pairs, negatives=0)
        b = train_sgns_sharded(
            pairs, dim=4, epochs=2, negatives=0, seed=11, portable=True
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_driver_vocab_cap_raises(self, pairs):
        with pytest.raises(ValueError, match="train_sgns_sharded"):
            _train(pairs, max_driver_vocab=3)
