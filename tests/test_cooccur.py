"""Token co-occurrence graph builder (pipeline/cooccur.py):
hand-checked counts, within-doc repeats collapse, df caps are exact,
brute-force parity on a random corpus."""

import random
from itertools import combinations

from linkgraph.pipeline.cooccur import token_cooccurrence

DOCS = [
    (1, "apple banana cherry"),
    (2, "apple banana"),
    (3, "banana cherry date date"),
    (4, "apple zebra"),
]


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _brute(docs, min_df, max_df, min_count):
    toksets = {i: set(t.split()) - {""} for i, t in docs}
    df = {}
    for ts in toksets.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    kept = {
        t for t, d in df.items() if d >= min_df and (max_df is None or d <= max_df)
    }
    out = {}
    for ts in toksets.values():
        for u, v in combinations(sorted(ts & kept), 2):
            out[(u, v)] = out.get((u, v), 0) + 1
    return {k: c for k, c in out.items() if c >= min_count}


class TestCooccurrence:
    def test_hand_counts(self, spark):
        got = {
            (r["u"], r["v"]): r["n_docs"]
            for r in token_cooccurrence(_df(spark, DOCS)).collect()
        }
        # date/zebra are hapax (df=1); (apple,cherry) shares only doc 1
        assert got == {("apple", "banana"): 2, ("banana", "cherry"): 2}

    def test_max_df_cap_is_exact(self, spark):
        got = token_cooccurrence(_df(spark, DOCS), max_df=2, min_count=1).collect()
        # apple/banana (df=3) capped away; cherry alone cannot pair
        assert got == []

    def test_brute_force_parity(self, spark):
        rng = random.Random(3)
        vocab = [f"w{i}" for i in range(12)]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 9))))
            for i in range(40)
        ]
        exp = _brute(docs, 2, 30, 2)
        got = {
            (r["u"], r["v"]): r["n_docs"]
            for r in token_cooccurrence(
                _df(spark, docs), min_df=2, max_df=30, min_count=2
            ).collect()
        }
        assert got == exp
