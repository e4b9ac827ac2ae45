"""Deterministic corpus sampling (pipeline/sample.py): portable mode
matches a hashlib-recomputed brute-force oracle exactly; production
(xxhash64) mode is deterministic, correctly sized, and weight-biased."""

import hashlib

import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import stratified_sample, weighted_sample
from linkgraph.pipeline.sample import U_DENOM

SEED = 7
LANGS = ["en", "de", "fr"]


def _u(tag: str, doc_id: int, seed: int) -> float:
    arg = f"{tag}:{doc_id}:{seed}"
    return int(hashlib.md5(arg.encode()).hexdigest()[:15], 16) / U_DENOM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, LANGS[i % len(LANGS)], 1 + (i * i) % 97)  # skewed weights
        for i in range(200)
    ] + [(900, "en", 0)]  # zero weight: must never be sampled
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long").cache()


class TestWeightedSample:
    def test_portable_matches_bruteforce(self, docs):
        got = weighted_sample(docs, k=20, seed=SEED, portable=True)
        got_ids = sorted(r.doc_id for r in got.collect())
        rows = [(r.doc_id, r.n_chars) for r in docs.collect() if r.n_chars > 0]
        keys = sorted((_u("ws", d, SEED) / w, d) for d, w in rows)
        assert got_ids == sorted(d for _, d in keys[:20])

    def test_production_mode_shape(self, docs):
        a = weighted_sample(docs, k=20, seed=SEED)
        b = weighted_sample(docs.repartition(7), k=20, seed=SEED)
        ids_a = sorted(r.doc_id for r in a.collect())
        ids_b = sorted(r.doc_id for r in b.collect())
        assert ids_a == ids_b and len(ids_a) == 20  # partition-invariant
        assert 900 not in ids_a  # zero-weight excluded

    def test_weight_bias(self, docs):
        # across seeds, the mean weight of sampled docs must exceed the
        # corpus mean (the entire point of priority sampling)
        corpus_mean = (
            docs.filter("n_chars > 0").agg(F.avg("n_chars")).collect()[0][0]
        )
        means = []
        for s in range(5):
            got = weighted_sample(docs, k=30, seed=s)
            means.append(got.agg(F.avg("n_chars")).collect()[0][0])
        assert sum(means) / len(means) > corpus_mean

    def test_seed_changes_sample(self, docs):
        a = {r.doc_id for r in weighted_sample(docs, k=20, seed=1).collect()}
        b = {r.doc_id for r in weighted_sample(docs, k=20, seed=2).collect()}
        assert a != b


class TestProportionalSample:
    RATES = {"en": 1.0, "de": 0.5, "fr": 0.0}

    def test_portable_matches_bruteforce(self, docs):
        from linkgraph.pipeline import proportional_sample

        got = {
            r.doc_id
            for r in proportional_sample(
                docs, self.RATES, seed=SEED, portable=True
            ).collect()
        }
        want = set()
        for r in docs.collect():
            thr = int(self.RATES.get(r.lang, 0.0) * U_DENOM)
            u = int(
                hashlib.md5(f"ps:{r.doc_id}:{SEED}".encode()).hexdigest()[:15], 16
            )
            if u < thr:
                want.add(r.doc_id)
        assert got == want

    def test_rates_respected(self, docs):
        from linkgraph.pipeline import proportional_sample

        got = proportional_sample(docs, self.RATES, seed=SEED).collect()
        by = {}
        for r in got:
            by[r.lang] = by.get(r.lang, 0) + 1
        n_en = docs.filter("lang = 'en'").count()
        assert by["en"] == n_en  # rate 1.0 keeps everything
        assert "fr" not in by  # rate 0.0 drops everything
        n_de = docs.filter("lang = 'de'").count()
        assert 0 < by.get("de", 0) < n_de  # rate 0.5 keeps a strict subset

    def test_default_rate_for_unlisted_stratum(self, docs):
        from linkgraph.pipeline import proportional_sample

        got = proportional_sample(
            docs, {"en": 0.5}, seed=SEED, default_rate=1.0
        ).collect()
        langs = {r.lang for r in got}
        assert {"de", "fr"} <= langs  # unlisted strata kept at rate 1.0


class TestStratifiedSample:
    def test_portable_matches_bruteforce(self, docs):
        got = stratified_sample(docs, k_per_stratum=4, seed=SEED, portable=True)
        per_lang = {}
        for r in docs.collect():
            per_lang.setdefault(r.lang, []).append(r.doc_id)
        want = set()
        for lang, ids in per_lang.items():
            ids.sort(key=lambda d: (_u("ss", d, SEED), d))
            want.update(ids[:4])
        assert {r.doc_id for r in got.collect()} == want

    def test_counts_per_stratum(self, docs):
        got = stratified_sample(docs, k_per_stratum=4, seed=SEED)
        counts = {r.lang: r.c for r in got.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        assert counts == {lang: 4 for lang in LANGS}

    def test_small_stratum_kept_whole(self, spark):
        rows = [(1, "en"), (2, "en"), (3, "xx")]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        got = stratified_sample(df, k_per_stratum=5, seed=SEED)
        assert got.count() == 3
