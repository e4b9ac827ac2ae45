"""Text analysis over a documents table — all JVM-side built-ins
(no Python in the hot path), each expressible in ANSI SQL for the
oracle gate.

Operates on any DF with (doc_id BIGINT, text STRING).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword list shared with the oracle SQL
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return docs.select("doc_id", F.size(_tokens()).alias("n_tokens"))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, stop_ratio, avg_token_len, quality)

    Heuristic quality scoring: stopword ratio + mean token length +
    length band. Deterministic, rounded to 6dp for cross-engine compare.
    """
    toks = _tokens()
    stop_arr = "array({})".format(",".join(f"'{w}'" for w in STOPWORDS))
    n_stop = F.size(F.expr(f"filter(split(text, ' '), t -> array_contains({stop_arr}, t))"))
    n_tok = F.size(toks)
    avg_len = F.expr(
        "aggregate(split(text, ' '), 0L, (acc, t) -> acc + length(t))"
    ) / n_tok
    stop_ratio = n_stop / n_tok
    quality = (
        F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when((stop_ratio > 0.01) & (stop_ratio < 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((avg_len > 2.0) & (avg_len < 12.0), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — n-gram/stopword heuristic language ID:
     'en' when English stopword density clears a threshold."""
    stop_arr = "array({})".format(",".join(f"'{w}'" for w in STOPWORDS))
    ratio = F.size(
        F.expr(f"filter(split(text, ' '), t -> array_contains({stop_arr}, t))")
    ) / F.size(_tokens())
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


def vocabulary(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """(term, tf, df) — corpus vocabulary: the ``top_k`` terms by
    document frequency (ties: total frequency desc, then term asc).

    The 100 TB shape: one explode + one groupBy (Spark plans the
    count-distinct as a two-round partial aggregate, so per-term state
    stays bounded), and the top-k is a TakeOrdered over the aggregated
    term table — no global sort of the token stream.
    """
    terms = docs.select(
        "doc_id", F.explode(_tokens()).alias("term")
    ).filter(F.col("term") != "")
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("df").desc(), F.col("tf").desc(), F.col("term"))
        .limit(top_k)
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — stable 64-bit-ish content fingerprint
    (hex prefix of md5; identical in any engine with md5)."""
    return docs.select(
        "doc_id", F.substring(F.md5(F.col("text")), 1, 16).alias("fingerprint")
    )


# BPE-style pre-tokenization, simplified to an engine-portable regex:
# letter runs, digit runs, and single punctuation marks each count as
# one subtoken (the GPT-2 pre-tokenizer split shape). Only the ASCII
# space is treated as whitespace so Spark (Java regex) and the DuckDB
# oracle (RE2) count identically.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_subtokens) — whitespace token count plus a
    BPE-ish subtoken count from :data:`BPE_PATTERN`. Both are one
    JVM-side expression over the text column (no Python), so the scan
    stays a single whole-stage-codegen pass at any corpus size."""
    return docs.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)")
        ).cast("long").alias("n_subtokens"),
    )
