"""Partition-quality report (algorithms/partition_stats.py)."""

import hashlib

import pytest

from linkgraph.algorithms.partition_stats import partition_quality


def _part(v, n_parts, seed=42):
    arg = f"pt:{v}:{seed}"
    return int(hashlib.md5(arg.encode()).hexdigest()[:6], 16) % n_parts


EDGES = [(i, (i * 7 + 3) % 20) for i in range(20)] + [(3, 15), (8, 2)]


class TestPartitionQuality:
    def test_portable_matches_bruteforce(self, spark):
        e = spark.createDataFrame(EDGES, "src long, dst long")
        n_parts = 4
        got = {
            r["partition"]: (r["n_vertices"], r["n_out_edges"], r["n_cut_edges"])
            for r in partition_quality(e, n_parts, portable=True).collect()
        }
        verts = {v for ed in EDGES for v in ed}
        exp = {}
        for k in range(n_parts):
            nv = sum(1 for v in verts if _part(v, n_parts) == k)
            no = sum(1 for s, d in EDGES if _part(s, n_parts) == k)
            nc = sum(
                1
                for s, d in EDGES
                if _part(s, n_parts) == k and _part(d, n_parts) != k
            )
            if nv or no:
                exp[k] = (nv, no, nc)
        assert got == exp

    def test_totals_are_invariants(self, spark):
        e = spark.createDataFrame(EDGES, "src long, dst long")
        for portable in (False, True):
            rows = partition_quality(e, 5, portable=portable).collect()
            assert sum(r["n_out_edges"] for r in rows) == len(EDGES)
            assert sum(r["n_vertices"] for r in rows) == len(
                {v for ed in EDGES for v in ed}
            )
            for r in rows:
                assert 0 <= r["n_cut_edges"] <= r["n_out_edges"]

    def test_single_partition_no_cut(self, spark):
        e = spark.createDataFrame(EDGES, "src long, dst long")
        rows = partition_quality(e, 1).collect()
        assert len(rows) == 1 and rows[0]["n_cut_edges"] == 0

    def test_community_renumbering_lowers_cut(self, spark):
        """The report's purpose as a before/after meter: under RANGE
        placement, two dense blocks with contiguous ids cut nothing,
        while the same graph with ids interleaved across blocks cuts
        heavily (hash placement is locality-free by design — range is
        the mode that rewards community-aligned renumbering)."""
        import itertools

        blocks = list(itertools.combinations(range(8), 2)) + list(
            itertools.combinations(range(8, 16), 2)
        )
        # interleave the two blocks' ids (even ids block A, odd block B)
        members = sorted({x for ed in blocks for x in ed})
        remap = {}
        for v in members:
            remap[v] = v * 2 if v < 8 else (v - 8) * 2 + 1
        shuffled = [(remap[a], remap[b]) for a, b in blocks]
        e1 = spark.createDataFrame(blocks, "src long, dst long")
        e2 = spark.createDataFrame(shuffled, "src long, dst long")

        def cutfrac(df):
            rows = partition_quality(df, 2, method="range").collect()
            return sum(r["n_cut_edges"] for r in rows) / sum(
                r["n_out_edges"] for r in rows
            )

        assert cutfrac(e1) == 0.0
        assert cutfrac(e2) > 0.4

    def test_rejects_zero_parts(self, spark):
        e = spark.createDataFrame(EDGES, "src long, dst long")
        with pytest.raises(ValueError):
            partition_quality(e, 0)


    def test_range_span_covers_explicit_vertices(self, spark):
        """ADVICE r3: range placement must derive the id span from
        max(vertices.id, edge endpoints) — isolated vertices with ids
        above every edge id used to clamp into the last block."""
        e = spark.createDataFrame([(0, 1)], "src long, dst long")
        v = spark.createDataFrame([(i,) for i in range(8)], "id long")
        rows = partition_quality(e, 4, vertices=v, method="range").collect()
        nv = {r["partition"]: r["n_vertices"] for r in rows}
        # span = 8 -> blocks of 2: perfectly balanced, no last-block pile
        assert nv == {0: 2, 1: 2, 2: 2, 3: 2}

    def test_range_empty_input_raises(self, spark):
        e = spark.createDataFrame([], "src long, dst long")
        with pytest.raises(ValueError, match="id span"):
            partition_quality(e, 4, method="range")


class TestKMVByGroup:
    def test_per_group_estimates(self, spark):
        """Per-group KMV: small groups degenerate to exact counts."""
        from linkgraph.pipeline.sketches import kmv_distinct_by

        rows = [
            (0, "a b c a", "py"),
            (1, "c d", "py"),
            (2, "x y z w q", "go"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {
            r["lang"]: (r["k_used"], r["est_distinct"])
            for r in kmv_distinct_by(df, "lang", k=64).collect()
        }
        assert got["py"] == (4, 4.0)   # {a,b,c,d}
        assert got["go"] == (5, 5.0)   # {x,y,z,w,q}


class TestRenumber:
    def test_dense_permutation_ordered_by_label(self, spark):
        from linkgraph.algorithms.partition_stats import renumber_by_label

        labels = spark.createDataFrame(
            [(10, 2), (11, 1), (12, 2), (13, 1), (14, 3)],
            "id long, component long",
        )
        got = {r["id"]: r["new_id"]
               for r in renumber_by_label(labels).collect()}
        # (label, id) order: (1,11) (1,13) (2,10) (2,12) (3,14)
        assert got == {11: 0, 13: 1, 10: 2, 12: 3, 14: 4}

    def test_range_cut_drops_after_community_renumber(self, spark):
        """The operator's point: after renumbering by community, range
        placement keeps intra-community edges partition-local, so the
        cut fraction drops vs the scrambled original ids."""
        from linkgraph.algorithms.partition_stats import renumber_by_label

        # two 8-cliques whose original ids interleave (worst case for
        # range placement), one bridge edge
        a = [2 * i for i in range(8)]        # evens -> community A
        b = [2 * i + 1 for i in range(8)]    # odds  -> community B
        edges = (
            [(u, v) for u in a for v in a if u < v]
            + [(u, v) for u in b for v in b if u < v]
            + [(a[0], b[0])]
        )
        e = spark.createDataFrame(edges, "src long, dst long")
        labels = spark.createDataFrame(
            [(v, 0) for v in a] + [(v, 1) for v in b],
            "id long, component long",
        )

        def cutfrac(edges_df):
            rows = partition_quality(edges_df, 2, method="range").collect()
            return sum(r["n_cut_edges"] for r in rows) / sum(
                r["n_out_edges"] for r in rows
            )

        before = cutfrac(e)
        m = renumber_by_label(labels)
        ren = (
            e.join(m.selectExpr("id AS src", "new_id AS nsrc"), "src")
            .join(m.selectExpr("id AS dst", "new_id AS ndst"), "dst")
            .selectExpr("nsrc AS src", "ndst AS dst")
        )
        after = cutfrac(ren)
        # interleaved ids: range blocks cut ~half the clique edges;
        # renumbered: only the single bridge edge crosses
        assert before > 0.3
        assert after <= 1 / len(edges) + 1e-9
