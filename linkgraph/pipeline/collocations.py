"""Collocation (phrase) mining over the document corpus.

Pointwise-mutual-information-style bigram scoring is the standard
phrase-mining pass in LLM data pipelines (merging "new york"-like
units before tokenizer training, vocabulary curation, n-gram LM
features). PMI itself is a log, which is not portable bit-for-bit
across engines; following the repo's integer-micro-unit house rule we
score by LIFT — the quantity inside the log,

    lift(x, y) = P(x,y) / (P(x) P(y)) ~= c_xy * N / (c_x * c_y)

with N the total matched-token count — as an exact floor-scaled
integer ``lift_micro = floor(10^6 * c_xy * N / (c_x * c_y))``
computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), so the value is
identical in both engines. lift and PMI induce the same ranking
(log is monotone).

Token contract matches pipeline/bpe.py: words are the ``^[a-z]+$``
space-split tokens; a bigram is a pair of ADJACENT positions in the
raw split where BOTH sides match (pairs never bridge a dropped
token).

100 TB shape: one corpus scan produces bigram positions (zip_with on
the split array, no shuffle), then ONE shuffle each for the bigram and
unigram groupBys — both vocabulary-sized outputs. Unigram counts and
the 1-row total broadcast onto the bigram table, so nothing
corpus-sized is ever joined or re-shuffled. int64 note: lift_micro
fits BIGINT while 10^6 * c_xy * N / (c_x * c_y) < 2^63; with the
default min_pair_count >= 2 that holds to ~4.6e12 total tokens per
partition-of-analysis — shard the corpus (and union results) beyond
that, or raise min_pair_count.

Reference parity note: the reference has no text pipeline; this sits
in the LLM-data tier beside textstats.py (SURVEY.md LLM-ops section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WORD_RE = "^[a-z]+$"


def collocation_pairs(docs: DataFrame, min_pair_count: int = 3) -> DataFrame:
    """(l, r, pair_count, left_count, right_count, lift_micro) for
    every adjacent-token bigram seen at least ``min_pair_count``
    times. lift_micro = floor(1e6 * pair_count * N / (left_count *
    right_count)), exact integer arithmetic (module docstring).
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok").rlike(_WORD_RE))
    uni = toks.groupBy(F.col("tok").alias("w")).agg(
        F.count(F.lit(1)).alias("w_cnt")
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))

    arr = docs.select(F.split(F.col("text"), " ").alias("a"))
    pairs = (
        arr.select(
            F.expr(
                "explode(zip_with(slice(a, 1, size(a) - 1),"
                " slice(a, 2, size(a) - 1),"
                " (x, y) -> struct(x AS l, y AS r)))"
            ).alias("p")
        )
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .filter(F.col("l").rlike(_WORD_RE) & F.col("r").rlike(_WORD_RE))
        .groupBy("l", "r")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    return (
        pairs.join(
            F.broadcast(uni.select(F.col("w").alias("l"), F.col("w_cnt").alias("left_count"))),
            "l",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("r"), F.col("w_cnt").alias("right_count"))),
            "r",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "l",
            "r",
            "pair_count",
            "left_count",
            "right_count",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * pair_count * n_total)"
                " DIV (CAST(left_count AS DECIMAL(38,0)) * right_count)"
                " AS BIGINT)"
            ).alias("lift_micro"),
        )
    )
