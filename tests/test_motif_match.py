"""Motif pattern matching (algorithms/motif_match.py)."""

import itertools

import pytest

from linkgraph.algorithms.motif_match import motif_find, parse_pattern

EDGES = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 0), (1, 3), (4, 0)]


def _brute(pattern_terms, edges, where=None):
    es = set(edges)
    verts = sorted({v for e in edges for v in e})
    pos = [t for t in pattern_terms if not t.neg]
    neg = [t for t in pattern_terms if t.neg]
    names = sorted({t.a for t in pattern_terms} | {t.b for t in pattern_terms})
    out = set()
    for combo in itertools.product(verts, repeat=len(names)):
        b = dict(zip(names, combo))
        if all((b[t.a], b[t.b]) in es for t in pos) and all(
            (b[t.a], b[t.b]) not in es for t in neg
        ):
            if where is None or where(b):
                out.add(tuple(b[n] for n in names))
    return out


class TestMotifMatch:
    def _run(self, spark, pattern, where=None):
        e = spark.createDataFrame(EDGES, "src long, dst long")
        df = motif_find(e, pattern, where=where)
        return set(tuple(r[c] for c in sorted(df.columns)) for r in df.collect())

    def test_single_edge(self, spark):
        got = self._run(spark, "(a)-[]->(b)")
        assert got == set(EDGES)

    def test_two_hop_path(self, spark):
        got = self._run(spark, "(a)-[]->(b); (b)-[]->(c)")
        assert got == _brute(parse_pattern("(a)-[]->(b); (b)-[]->(c)"), EDGES)

    def test_open_triad_negation(self, spark):
        pat = "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)"
        got = self._run(spark, pat, where="a != c")
        exp = _brute(parse_pattern(pat), EDGES, where=lambda b: b["a"] != b["c"])
        assert got == exp

    def test_directed_triangle(self, spark):
        pat = "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)"
        got = self._run(spark, pat)
        exp = _brute(parse_pattern(pat), EDGES)
        assert got == exp and (0, 2, 3) in {tuple(sorted(t)) for t in got}

    def test_out_of_order_terms_chain(self, spark):
        """Terms listed disconnected-first still chain via the greedy
        shared-variable pick."""
        pat = "(c)-[]->(d); (a)-[]->(b); (b)-[]->(c)"
        got = self._run(spark, pat)
        exp = _brute(parse_pattern(pat), EDGES)
        assert got == exp

    def test_rejects_disconnected(self, spark):
        e = spark.createDataFrame(EDGES, "src long, dst long")
        with pytest.raises(ValueError, match="disconnected"):
            motif_find(e, "(a)-[]->(b); (c)-[]->(d)")

    def test_allow_cross(self, spark):
        e = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
        df = motif_find(e, "(a)-[]->(b); (c)-[]->(d)", allow_cross=True)
        assert df.count() == 4

    def test_max_degree_excludes_hub(self, spark):
        # vertex 0 has total degree 4 in EDGES; cap at 3 removes it
        e = spark.createDataFrame(EDGES, "src long, dst long")
        got = set(
            (r["a"], r["b"])
            for r in motif_find(e, "(a)-[]->(b)", max_degree=3).collect()
        )
        assert got == {(s, d) for s, d in EDGES if 0 not in (s, d)}

    def test_rejects_malformed(self):
        with pytest.raises(ValueError, match="malformed"):
            parse_pattern("(a)->(b)")
        with pytest.raises(ValueError, match="self-loop"):
            parse_pattern("(a)-[]->(a)")
        with pytest.raises(ValueError, match="positive"):
            parse_pattern("!(a)-[]->(b)")

    def test_rejects_unbound_negation(self, spark):
        e = spark.createDataFrame(EDGES, "src long, dst long")
        with pytest.raises(ValueError, match="unbound"):
            motif_find(e, "(a)-[]->(b); !(a)-[]->(z)")


class TestNamedEdges:
    TEDGES = [
        (0, 1, 5), (1, 2, 7), (1, 2, 3),   # (1,2) recurs at two times
        (2, 3, 9), (0, 2, 1),
    ]

    def _tdf(self, spark):
        return spark.createDataFrame(self.TEDGES, "src long, dst long, t long")

    def test_named_edge_exposes_attrs_and_multiplicity(self, spark):
        df = motif_find(self._tdf(spark), "(a)-[e1]->(b)")
        got = {(r["a"], r["b"], r["e1_t"]) for r in df.collect()}
        assert got == set(self.TEDGES)
        assert sorted(df.columns) == ["a", "b", "e1_t"]

    def test_time_respecting_chain(self, spark):
        df = motif_find(
            self._tdf(spark),
            "(a)-[e1]->(b); (b)-[e2]->(c)",
            where="e2_t >= e1_t",
        )
        got = {(r["a"], r["b"], r["c"], r["e1_t"], r["e2_t"]) for r in df.collect()}
        exp = {
            (a, b1, c, t1, t2)
            for (a, b1, t1) in self.TEDGES
            for (b2, c, t2) in self.TEDGES
            if b1 == b2 and t2 >= t1
        }
        assert got == exp
        # the out-of-order occurrence (1,2,@3) after (0,1,@5) is excluded
        assert (0, 1, 2, 5, 3) not in got and (0, 1, 2, 5, 7) in got

    def test_unnamed_terms_keep_existence_semantics(self, spark):
        # unnamed: the duplicated (1,2) pair matches once
        df = motif_find(self._tdf(spark), "(a)-[]->(b)")
        assert df.count() == 4

    def test_mixing_named_and_negated(self, spark):
        df = motif_find(
            self._tdf(spark), "(a)-[e1]->(b); !(b)-[]->(a)"
        )
        assert df.count() == len(self.TEDGES)  # no reciprocal edges exist

    def test_rejects_named_negation_and_collisions(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="negated term cannot name"):
            parse_pattern("(a)-[]->(b); !(a)-[e]->(b)")
        with _pytest.raises(ValueError, match="duplicate edge name"):
            parse_pattern("(a)-[e]->(b); (b)-[e]->(c)")
        with _pytest.raises(ValueError, match="collide"):
            parse_pattern("(a)-[b]->(b)")
