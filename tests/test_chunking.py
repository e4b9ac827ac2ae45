"""Sliding-window chunking (pipeline/packing.chunk_documents)."""

import pytest

from linkgraph.pipeline.packing import chunk_documents


def _brute(text, chunk_size, overlap):
    toks = text.split(" ")
    n = len(toks)
    stride = chunk_size - overlap
    n_chunks = 1 + (0 if n <= chunk_size else -(-(n - chunk_size) // stride))
    out = []
    for i in range(n_chunks):
        start = i * stride
        ln = min(chunk_size, n - start)
        out.append((i, start, ln, " ".join(toks[start : start + ln])))
    return out


class TestChunking:
    @pytest.mark.parametrize("chunk_size,overlap", [(4, 0), (4, 2), (5, 1)])
    def test_matches_bruteforce(self, spark, chunk_size, overlap):
        texts = [
            "a b c d e f g h i j",
            "one two three",
            "x",
            "p q r s",          # exactly one window at chunk_size=4
            "m n o p q",        # one token past a window
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        rows = chunk_documents(df, chunk_size=chunk_size, overlap=overlap).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["start"], r["n_tokens"], r["chunk_text"])
            )
        for did, text in enumerate(texts):
            assert sorted(got[did]) == _brute(text, chunk_size, overlap), (
                did, chunk_size, overlap)

    def test_every_token_covered_and_overlap_exact(self, spark):
        text = " ".join(f"t{i}" for i in range(23))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, chunk_size=8, overlap=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        covered = set()
        for r in rows:
            covered |= set(range(r["start"], r["start"] + r["n_tokens"]))
        assert covered == set(range(23))
        # consecutive chunks share exactly `overlap` tokens (full windows)
        for a, b in zip(rows, rows[1:]):
            shared = set(range(a["start"], a["start"] + a["n_tokens"])) & set(
                range(b["start"], b["start"] + b["n_tokens"])
            )
            assert len(shared) == 3 or b["n_tokens"] < 8

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_size=0)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_size=4, overlap=4)

    def test_no_text_column_option(self, spark):
        df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        cols = chunk_documents(
            df, chunk_size=2, overlap=0, include_text=False
        ).columns
        assert "chunk_text" not in cols
