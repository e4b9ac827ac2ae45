"""Sequence packing (pipeline/packing.py): positions match a Python
replay of the concatenate-then-chunk stream in both coin modes; bins
fill to the budget; no token is double-assigned."""

import hashlib

import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import pack_sequences

SEED = 9
BUDGET = 100
GROUPS = 4


def _group(doc_id: int, seed: int, n_groups: int) -> int:
    return int(hashlib.md5(f"pk:{doc_id}:{seed}".encode()).hexdigest()[:6], 16) % n_groups


def _brute_pack(rows, budget, n_groups, seed):
    # rows: (doc_id, n_tokens)
    out = {}
    streams = {}
    for doc_id, n in sorted(rows):
        grp = _group(doc_id, seed, n_groups)
        start = streams.get(grp, 0)
        streams[grp] = start + n
        off = start % budget
        spans = -(-(off + n) // budget) if n else 0
        out[doc_id] = (n, grp, start, start // budget, off, spans)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "tok " * ((i * 13) % 250)) for i in range(120)]
    # doc 200: empty text still gets a position ('' splits to [''] = 1
    # token under the whitespace convention, so use an explicit count)
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


class TestPackSequences:
    def test_portable_matches_bruteforce(self, docs):
        got = {
            r.doc_id: (r.n_tokens, r.group, r.start, r.bin, r.offset, r.n_spans)
            for r in pack_sequences(
                docs, budget=BUDGET, n_groups=GROUPS, seed=SEED, portable=True
            ).collect()
        }
        toks = {r.doc_id: r.n for r in docs.select("doc_id", F.size(F.split("text", " ")).alias("n")).collect()}
        want = _brute_pack(list(toks.items()), BUDGET, GROUPS, SEED)
        assert got == want

    def test_production_mode_stream_is_gapless(self, docs):
        got = pack_sequences(docs, budget=BUDGET, n_groups=GROUPS, seed=SEED).collect()
        by_group = {}
        for r in got:
            by_group.setdefault(r.group, []).append(r)
        assert set(by_group) <= set(range(GROUPS))
        for grp, rows in by_group.items():
            rows.sort(key=lambda r: r.doc_id)
            pos = 0
            for r in rows:
                assert r.start == pos  # gapless concatenation
                assert r.bin == r.start // BUDGET
                assert r.offset == r.start % BUDGET
                pos += r.n_tokens

    def test_partition_invariance(self, docs):
        a = pack_sequences(docs, budget=BUDGET, n_groups=GROUPS, seed=SEED)
        b = pack_sequences(
            docs.repartition(11), budget=BUDGET, n_groups=GROUPS, seed=SEED
        )
        assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}

    def test_precomputed_token_col_and_empty_doc(self, spark):
        df = spark.createDataFrame(
            [(1, 30), (2, 0), (3, 250)], "doc_id long, n_tok long"
        )
        got = {
            r.doc_id: r
            for r in pack_sequences(
                df, budget=BUDGET, n_groups=1, token_col="n_tok", seed=SEED
            ).collect()
        }
        assert got[2].n_spans == 0  # empty doc occupies no window
        assert got[3].n_spans == 3  # 250 tokens from offset 30 -> 3 windows
        assert got[3].start == 30 and got[3].bin == 0 and got[3].offset == 30
