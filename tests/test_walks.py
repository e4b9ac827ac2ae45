"""Deterministic random walks (algorithms/walks.py): portable mode
matches a hashlib-recomputed brute-force simulation exactly; production
(xxhash64) mode is deterministic, edge-valid, and partition-invariant."""

import hashlib

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.walks import indexed_edges, node2vec_walks, random_walks

SEED = 11
W = 2
L = 5

# directed toy graph: 0 is a small hub, 5 is a dead end reachable from
# 4, 6/7 form a 2-cycle, 8 is an isolated source with one edge to the
# dead end
EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4),
    (1, 0), (2, 0), (3, 4),
    (4, 5),
    (6, 7), (7, 6),
    (8, 5),
]


def _coin(walk_id: int, k: int, seed: int) -> int:
    arg = f"rw:{walk_id}:{k}:{seed}"
    return int(hashlib.md5(arg.encode()).hexdigest()[:6], 16)


def _brute_walks(edges, n_walks_per_v, length, seed):
    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    verts = sorted({v for e in edges for v in e})
    rows = set()
    for v in verts:
        for r in range(n_walks_per_v):
            wid = v * n_walks_per_v + r
            cur = v
            rows.add((wid, 0, v))
            for k in range(1, length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_coin(wid, k, seed) % len(nbrs)]
                rows.add((wid, k, cur))
    return rows


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long").cache()


class TestIndexedEdges:
    def test_shape(self, edges_df):
        ie = {(r.src, r.dst): (r.idx, r.deg) for r in indexed_edges(edges_df).collect()}
        assert ie[(0, 1)] == (0, 4) and ie[(0, 4)] == (3, 4)
        assert ie[(4, 5)] == (0, 1)
        # idx is a dense rank by dst within src
        assert sorted(i for (s, _), (i, _) in ie.items() if s == 0) == [0, 1, 2, 3]


class TestRandomWalks:
    def test_portable_matches_bruteforce(self, edges_df):
        corpus, res = random_walks(
            edges_df, walks_per_vertex=W, walk_length=L, seed=SEED, portable=True
        )
        got = {(r.walk_id, r.step, r.vertex) for r in corpus.collect()}
        assert got == _brute_walks(EDGES, W, L, SEED)

    def test_production_walks_are_edge_valid(self, edges_df):
        corpus, _ = random_walks(
            edges_df, walks_per_vertex=W, walk_length=L, seed=SEED
        )
        rows = corpus.collect()
        byw = {}
        for r in rows:
            byw.setdefault(r.walk_id, {})[r.step] = r.vertex
        eset = set(EDGES)
        for wid, steps in byw.items():
            assert steps[0] == wid // W  # step 0 is the start vertex
            ks = sorted(steps)
            assert ks == list(range(len(ks)))  # no gaps
            for k in ks[1:]:
                assert (steps[k - 1], steps[k]) in eset

    def test_production_partition_invariance(self, edges_df):
        a, _ = random_walks(edges_df, walks_per_vertex=W, walk_length=L, seed=SEED)
        b, _ = random_walks(
            edges_df.repartition(7), walks_per_vertex=W, walk_length=L, seed=SEED
        )
        assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}

    def test_dead_end_stops(self, edges_df):
        corpus, _ = random_walks(
            edges_df, walks_per_vertex=1, walk_length=L, seed=SEED
        )
        # vertex 5 has no out-edges: its walk is exactly the start row
        rows = [r for r in corpus.collect() if r.walk_id == 5]
        assert [(r.step, r.vertex) for r in rows] == [(0, 5)]

    def test_walk_count_and_length_bound(self, edges_df):
        corpus, res = random_walks(
            edges_df, walks_per_vertex=W, walk_length=L, seed=SEED
        )
        n_verts = len({v for e in EDGES for v in e})
        stats = corpus.agg(
            F.countDistinct("walk_id").alias("w"), F.max("step").alias("mx")
        ).collect()[0]
        assert stats.w == W * n_verts
        assert stats.mx <= L
        assert res.supersteps <= L

    def test_seed_changes_corpus(self, edges_df):
        a, _ = random_walks(edges_df, walks_per_vertex=1, walk_length=L, seed=1)
        b, _ = random_walks(edges_df, walks_per_vertex=1, walk_length=L, seed=2)
        assert {tuple(r) for r in a.collect()} != {tuple(r) for r in b.collect()}


def _brute_weighted_walks(wedges, n_walks_per_v, length, seed):
    # wedges: (src, dst, w); cumulative-weight interval pick
    adj = {}
    for s, d, w in sorted(wedges):
        adj.setdefault(s, []).append((d, w))
    verts = sorted({v for s, d, _ in wedges for v in (s, d)})
    rows = set()
    for v in verts:
        for r in range(n_walks_per_v):
            wid = v * n_walks_per_v + r
            cur = v
            rows.add((wid, 0, v))
            for k in range(1, length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                total = sum(w for _, w in nbrs)
                draw = _coin(wid, k, seed) % total
                acc = 0
                for d, w in nbrs:
                    if acc <= draw < acc + w:
                        cur = d
                        break
                    acc += w
                rows.add((wid, k, cur))
    return rows


class TestWeightedRandomWalks:
    WEDGES = [(0, 1, 1), (0, 2, 5), (1, 0, 2), (2, 0, 1), (2, 3, 3), (3, 0, 4)]

    @pytest.fixture(scope="class")
    def wdf(self, spark):
        return spark.createDataFrame(
            self.WEDGES, "src long, dst long, w long"
        ).cache()

    def test_portable_matches_bruteforce(self, wdf):
        corpus, _ = random_walks(
            wdf, walks_per_vertex=W, walk_length=L, seed=SEED,
            portable=True, weight_col="w",
        )
        got = {(r.walk_id, r.step, r.vertex) for r in corpus.collect()}
        assert got == _brute_weighted_walks(self.WEDGES, W, L, SEED)

    def test_weight_bias(self, wdf):
        # from 0, edge 0->2 has 5x the weight of 0->1: across many walk
        # ids the first step must favor 2 heavily
        corpus, _ = random_walks(
            wdf, walks_per_vertex=50, walk_length=1, seed=SEED, weight_col="w"
        )
        firsts = [
            r.vertex
            for r in corpus.collect()
            if r.step == 1 and r.walk_id // 50 == 0
        ]
        assert len(firsts) == 50
        assert firsts.count(2) > 30  # E = 41.7

    def test_unit_weights_match_unweighted(self, spark):
        e = [(0, 1), (1, 2), (2, 0), (2, 3)]
        df = spark.createDataFrame(e, "src long, dst long")
        wdf = df.withColumn("w", F.lit(1))
        a, _ = random_walks(df, walks_per_vertex=2, walk_length=4, seed=3)
        b, _ = random_walks(
            wdf, walks_per_vertex=2, walk_length=4, seed=3, weight_col="w"
        )
        assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def _brute_node2vec(edges, n_walks_per_v, length, seed, mr, mc, mf):
    adj = {}
    eset = set(edges)
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    verts = sorted({v for e in edges for v in e})
    rows = set()
    for v in verts:
        for r in range(n_walks_per_v):
            wid = v * n_walks_per_v + r
            prev, cur = None, v
            rows.add((wid, 0, v))
            for k in range(1, length + 1):
                cands = []
                for d in adj.get(cur, []):
                    if prev is not None and d == prev:
                        m = mr
                    elif prev is not None and (d, prev) in eset:
                        m = mc
                    else:
                        m = mf
                    if m > 0:
                        cands.append((d, m))
                if not cands:
                    break
                tot = sum(m for _, m in cands)
                draw = _coin(wid, k, seed) % tot
                acc = 0
                for d, m in cands:
                    if acc <= draw < acc + m:
                        prev, cur = cur, d
                        break
                    acc += m
                rows.add((wid, k, cur))
    return rows


class TestNode2vecWalks:
    MR, MC, MF = 4, 2, 1  # return-biased, then BFS-ish, then DFS-ish

    def test_portable_matches_bruteforce(self, edges_df):
        corpus, _ = node2vec_walks(
            edges_df, walks_per_vertex=W, walk_length=L, seed=SEED,
            mult_return=self.MR, mult_common=self.MC, mult_far=self.MF,
            portable=True,
        )
        got = {(r.walk_id, r.step, r.vertex) for r in corpus.collect()}
        want = _brute_node2vec(EDGES, W, L, SEED, self.MR, self.MC, self.MF)
        assert got == want

    def test_uniform_multipliers_match_first_order(self, edges_df):
        a, _ = node2vec_walks(
            edges_df, walks_per_vertex=W, walk_length=L, seed=SEED,
            mult_return=1, mult_common=1, mult_far=1,
        )
        b, _ = random_walks(edges_df, walks_per_vertex=W, walk_length=L, seed=SEED)
        assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}

    def test_zero_return_never_backtracks(self, spark):
        # path graph 0-1-2 (both directions): with mult_return=0 a walk
        # at 1 must continue away from where it came
        e = [(0, 1), (1, 0), (1, 2), (2, 1)]
        df = spark.createDataFrame(e, "src long, dst long")
        corpus, _ = node2vec_walks(
            df, walks_per_vertex=8, walk_length=6, seed=SEED,
            mult_return=0, mult_common=1, mult_far=1,
        )
        byw = {}
        for r in corpus.collect():
            byw.setdefault(r.walk_id, {})[r.step] = r.vertex
        for steps in byw.values():
            ks = sorted(steps)
            for k in ks[2:]:
                assert steps[k] != steps[k - 2], f"backtracked: {steps}"

    def test_production_mode_partition_invariance(self, edges_df):
        a, _ = node2vec_walks(
            edges_df, walks_per_vertex=W, walk_length=L, seed=SEED,
            mult_return=2, mult_common=3, mult_far=1,
        )
        b, _ = node2vec_walks(
            edges_df.repartition(7), walks_per_vertex=W, walk_length=L,
            seed=SEED, mult_return=2, mult_common=3, mult_far=1,
        )
        assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_frame_storage_disk_only_same_corpus(spark):
    from pyspark.storagelevel import StorageLevel

    from linkgraph.algorithms.walks import random_walks

    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 20) for i in range(20)], "src long, dst long"
    )
    base, _ = random_walks(e, walk_length=5, portable=True)
    disk, _ = random_walks(
        e, walk_length=5, portable=True, frame_storage=StorageLevel.DISK_ONLY
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, disk.collect()))


def test_walk_resume_from_partial_checkpoints(spark, tmp_path):
    """Kill/resume: a run checkpointed every step, then resumed after
    'losing' the in-memory state, must rebuild the identical corpus —
    committed snapshots double as corpus frames."""
    from linkgraph.algorithms.walks import random_walks
    from linkgraph.checkpoint import CheckpointManager

    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 20) for i in range(20)]
        + [(i, (i * 7 + 2) % 20) for i in range(20)],
        "src long, dst long",
    )
    full, _ = random_walks(e, walk_length=6, seed=5, portable=True)
    expected = sorted(map(tuple, full.collect()))

    ck1 = CheckpointManager(spark, str(tmp_path / "ck"), every=1)
    partial, res1 = random_walks(
        e, walk_length=3, seed=5, portable=True, ckpt=ck1
    )
    partial.count()  # materialize through step 3; snapshots committed
    assert ck1.committed_supersteps() == [1, 2, 3]

    # resume in a fresh manager over the same dir, extending to 6
    ck2 = CheckpointManager(spark, str(tmp_path / "ck"), every=1)
    corpus, res2 = random_walks(
        e, walk_length=6, seed=5, portable=True, ckpt=ck2, resume=True
    )
    assert sorted(map(tuple, corpus.collect())) == expected
    # only steps 4..6 were actually re-run
    assert [h.superstep for h in res2.history] == [1, 2, 3, 4, 5, 6]
