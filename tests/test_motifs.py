"""Closed-triad census: independent brute-force oracle on a
deterministic directed graph + one hand fixture per MAN type."""

from itertools import combinations

import pytest

from linkgraph.algorithms.motifs import CLOSED_TRIAD_TYPES, closed_triad_census


def _classify(E, a, b, c):
    """Independent classifier (set logic, no reuse of the CASE SQL)."""
    pairs = [(a, b), (b, c), (a, c)]
    if not all((u, v) in E or (v, u) in E for u, v in pairs):
        return None
    mutual = [(u, v) for u, v in pairs if (u, v) in E and (v, u) in E]
    m = len(mutual)
    if m == 3:
        return "300"
    if m == 2:
        return "210"
    if m == 1:
        u, v = mutual[0]
        z = ({a, b, c} - {u, v}).pop()
        z_out = ((z, u) in E) + ((z, v) in E)
        if z_out == 2:
            return "120D"
        if z_out == 0:
            return "120U"
        return "120C"
    # all asymmetric: cyclic iff every vertex has out-degree 1 in-triple
    outdeg = {v: 0 for v in (a, b, c)}
    for u, v in pairs:
        if (u, v) in E:
            outdeg[u] += 1
        else:
            outdeg[v] += 1
    return "030C" if set(outdeg.values()) == {1} else "030T"


def _census_oracle(edge_list, n):
    E = {(u, v) for u, v in edge_list if u != v}
    verts = sorted({x for e in E for x in e})
    counts = {t: 0 for t in CLOSED_TRIAD_TYPES}
    for a, b, c in combinations(verts, 3):
        lab = _classify(E, a, b, c)
        if lab is not None:
            counts[lab] += 1
    return counts


def _arith_edges(n):
    out = []
    for s in range(n):
        for j in range(1, 1 + s % 7 + 1):
            d = (s * 31 + 97 * j * j + j) % n
            if d != s:
                out.append((s, d))
    return sorted(set(out))


class TestTriadCensus:
    def test_matches_bruteforce_on_arith_graph(self, spark):
        el = _arith_edges(40)
        df = spark.createDataFrame(el, "src long, dst long")
        got = {r["triad_type"]: r["n"] for r in closed_triad_census(df).collect()}
        assert got == _census_oracle(el, 40)
        assert set(got) == set(CLOSED_TRIAD_TYPES)

    @pytest.mark.parametrize(
        "edges,expected",
        [
            ([(0, 1), (1, 2), (0, 2)], "030T"),
            ([(0, 1), (1, 2), (2, 0)], "030C"),
            ([(0, 1), (1, 0), (2, 0), (2, 1)], "120D"),
            ([(0, 1), (1, 0), (0, 2), (1, 2)], "120U"),
            ([(0, 1), (1, 0), (1, 2), (2, 0)], "120C"),
            ([(0, 1), (1, 0), (1, 2), (2, 1), (0, 2)], "210"),
            ([(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)], "300"),
        ],
    )
    def test_each_type_fixture(self, spark, edges, expected):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["triad_type"]: r["n"] for r in closed_triad_census(df).collect()}
        assert got[expected] == 1, got
        assert sum(got.values()) == 1


def _classify16(E, a, b, c):
    """Full MAN classifier for a triple (independent set logic)."""
    pairs = [(a, b), (b, c), (a, c)]
    conn = [(u, v) for u, v in pairs if (u, v) in E or (v, u) in E]
    mutual = [(u, v) for u, v in pairs if (u, v) in E and (v, u) in E]
    m, k = len(mutual), len(conn)
    if k == 0:
        return "003"
    if k == 1:
        return "102" if m == 1 else "012"
    if k == 3:
        return _classify(E, a, b, c)
    # exactly two connected dyads: find the center (shared vertex)
    (p1, p2) = conn
    center = (set(p1) & set(p2)).pop()
    if m == 2:
        return "201"
    if m == 1:
        asym = p1 if p1 not in mutual else p2
        u, v = asym
        # direction of the asym arc relative to the center
        inbound = (u, v) in E and v == center or (v, u) in E and u == center
        return "111D" if inbound else "111U"
    # two asymmetric dyads at the center
    out = sum(1 for u, v in conn for (s, t) in [((u, v) if (u, v) in E else (v, u))] if s == center)
    if out == 2:
        return "021D"
    if out == 0:
        return "021U"
    return "021C"


def _census16_oracle(edge_list, n):
    E = {(u, v) for u, v in edge_list if u != v}
    from linkgraph.algorithms.motifs import ALL_TRIAD_TYPES

    counts = {t: 0 for t in ALL_TRIAD_TYPES}
    for a, b, c in combinations(range(n), 3):
        counts[_classify16(E, a, b, c)] += 1
    return counts


class TestFullTriadCensus:
    def test_matches_bruteforce_on_arith_graph(self, spark):
        from linkgraph.algorithms.motifs import triad_census

        n = 40
        el = _arith_edges(n)
        df = spark.createDataFrame(el, "src long, dst long")
        verts = spark.range(n).select("id")
        got = {r["triad_type"]: r["n"] for r in triad_census(df, vertices=verts).collect()}
        exp = _census16_oracle(el, n)
        assert got == exp
        assert sum(got.values()) == n * (n - 1) * (n - 2) // 6

    def test_isolated_vertices_count_in_open_types(self, spark):
        from linkgraph.algorithms.motifs import triad_census

        # one mutual pair + 3 isolated vertices (n=5)
        df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        verts = spark.range(5).select("id")
        got = {r["triad_type"]: r["n"] for r in triad_census(df, vertices=verts).collect()}
        exp = _census16_oracle([(0, 1), (1, 0)], 5)
        assert got == exp
        assert got["102"] == 3 and got["003"] == 7 and sum(got.values()) == 10
