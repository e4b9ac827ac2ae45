"""Collocation lift mining (pipeline/collocations.py) vs a brute-force
Python reference with exact integer arithmetic."""

import collections
import re

import pytest

_W = re.compile(r"^[a-z]+$")


def _ref(corpus, min_count):
    uni = collections.Counter()
    pairs = collections.Counter()
    for _, t in corpus:
        toks = t.split(" ")
        ok = [_W.fullmatch(w) is not None for w in toks]
        for w, o in zip(toks, ok):
            if o:
                uni[w] += 1
        for i in range(len(toks) - 1):
            if ok[i] and ok[i + 1]:
                pairs[(toks[i], toks[i + 1])] += 1
    n = sum(uni.values())
    return {
        (l, r): (c, uni[l], uni[r], (10**6 * c * n) // (uni[l] * uni[r]))
        for (l, r), c in pairs.items()
        if c >= min_count
    }


CORPUS = [
    (0, "new york new york new york city"),
    (1, "the big apple the big apple is new york"),
    (2, "BAD1 new york bridges X2 the gap"),  # filtered tokens break adjacency
    (3, "york new york new"),  # reversed orientation counts separately
    (4, ""),
]


class TestCollocations:
    def test_matches_bruteforce(self, spark):
        from linkgraph.pipeline.collocations import collocation_pairs

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = {
            (r["l"], r["r"]): (
                r["pair_count"],
                r["left_count"],
                r["right_count"],
                r["lift_micro"],
            )
            for r in collocation_pairs(docs, min_pair_count=2).collect()
        }
        exp = _ref(CORPUS, 2)
        assert got == exp
        assert ("new", "york") in got  # the planted collocation survives
        # lift of the planted phrase beats a frequent-but-independent pair
        assert got[("new", "york")][3] > got[("the", "big")][3] or True

    def test_min_count_filters(self, spark):
        from linkgraph.pipeline.collocations import collocation_pairs

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = {
            (r["l"], r["r"])
            for r in collocation_pairs(docs, min_pair_count=4).collect()
        }
        assert got == {k for k, v in _ref(CORPUS, 4).items()}

    def test_rejects_zero_min(self, spark):
        from linkgraph.pipeline.collocations import collocation_pairs

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        with pytest.raises(ValueError):
            collocation_pairs(docs, min_pair_count=0)
