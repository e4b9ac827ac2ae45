"""Distributed BPE merge learning (pipeline/bpe.py) vs the classic
sequential Sennrich algorithm."""

import collections

import pytest


def _ref_bpe(word_freqs, k):
    """Textbook sequential BPE: greedy left-to-right merge application,
    position-weighted pair counts, ties cnt DESC then (l, r) ASC."""
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for rnd in range(1, k + 1):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        best = sorted(p for p, c in pairs.items() if c == top)[0]
        merges.append((rnd, best[0], best[1], best[0] + best[1], top))
        nv = collections.Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += f
        vocab = dict(nv)
    return merges, vocab


CORPUS = [
    (0, "low low low lower lower newest newest newest newest widest widest"),
    (1, "newest wider low BADTOKEN1 aaaa aaaa"),
    (2, "aaaa aa aaaaaaaa banana bananas"),  # (a,a) chains + overlaps
    (3, ""),
]


def _word_freqs():
    wf = collections.Counter()
    for _, t in CORPUS:
        for w in t.split(" "):
            if w and w.isascii() and w.isalpha() and w.islower():
                wf[w] += 1
    return wf


class TestBpe:
    def test_merges_match_sequential_reference(self, spark):
        from linkgraph.pipeline.bpe import bpe_merges

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        got = [
            (r["round"], r["l"], r["r"], r["merged"], r["pair_count"])
            for r in bpe_merges(docs, 14).orderBy("round").collect()
        ]
        exp, _ = _ref_bpe(_word_freqs(), 14)
        assert got == exp

    def test_token_counts_match_reference_vocab(self, spark):
        from linkgraph.pipeline.bpe import bpe_token_counts

        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        _, vocab = _ref_bpe(_word_freqs(), 14)
        n_sym = {"".join(s).replace("</w>", ""): len(s) for s in vocab}
        exp = {
            d: sum(n_sym[w] for w in t.split(" ") if w in n_sym)
            for d, t in CORPUS
        }
        got = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_token_counts(docs, 14).collect()
        }
        assert got == exp
        assert got[3] == 0  # empty doc present with zero count

    def test_exhausted_corpus_fails_loudly(self, spark):
        from linkgraph.pipeline.bpe import bpe_merges

        docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
        # "ab</w>" fully merges after 2 rounds; round 3+ has single
        # symbols only -> must raise, not silently under-produce
        with pytest.raises(ValueError, match="exhausted"):
            bpe_merges(docs, 5).collect()

    def test_rejects_zero_merges(self, spark):
        from linkgraph.pipeline.bpe import bpe_merges

        docs = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bpe_merges(docs, 0)
