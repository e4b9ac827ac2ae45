"""Distributed sketches over a documents table.

KMV (k-minimum-values) distinct-count sketch — the classic
bottom-k estimator (Bar-Yossef et al., RANDOM'02): hash every distinct
element to a uniform integer, keep the k smallest hashes, estimate

    D  ≈  (k - 1) * M / h_(k)

where ``h_(k)`` is the k-th smallest hash and ``M`` the hash-space
size. Relative error ~ 1/sqrt(k).

Why this instead of ``approx_count_distinct``: Spark's built-in HLL is
not reproducible by an external engine, so it can't pass the driver's
DuckDB oracle gate. KMV over the portable md5 hash (linkgraph.phash) is
bit-deterministic in BOTH engines — the sketch itself is
oracle-verifiable, not just its accuracy.

The 100 TB shape: tokens never leave their partitions un-aggregated —
the plan is explode -> per-partition partial distinct -> one shuffle of
distinct hashes -> TakeOrdered(k) (Spark plans orderBy+limit as
per-partition top-k + a k-row merge on one reducer, NOT a global sort).
The driver sees k rows, never the vocabulary. This is the sketch tier of
the vocabulary operator (textstats.vocabulary is the exact tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..phash import md5_int_sql

#: hash-space size for the 15-hex-digit md5 draw (2^60, BIGINT-exact)
KMV_M = 16 ** 15


def kmv_distinct_tokens(docs: DataFrame, k: int = 256) -> DataFrame:
    """One-row DF(k_used BIGINT, kth_min_hash BIGINT,
    est_distinct DOUBLE): KMV estimate of the number of distinct
    whitespace tokens in the corpus.

    When the true vocabulary has fewer than ``k`` terms the bottom-k
    set IS the vocabulary and the exact count is returned
    (``est_distinct = k_used``), the standard small-cardinality
    degeneration of KMV.
    """
    if k < 2:
        raise ValueError("kmv_distinct_tokens: k must be >= 2")
    hashes = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .select(F.expr(md5_int_sql("term", 15)).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    return hashes.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_min_hash"),
    ).select(
        "k_used",
        "kth_min_hash",
        F.round(
            F.when(F.col("k_used") < k, F.col("k_used").cast("double")).otherwise(
                (F.col("k_used") - 1).cast("double")
                * F.lit(float(KMV_M))
                / F.col("kth_min_hash").cast("double")
            ),
            6,
        ).alias("est_distinct"),
    )


def kmv_sql(k: int = 256) -> str:
    """DuckDB oracle for :func:`kmv_distinct_tokens` — the identical
    md5-digit hash and estimator arithmetic."""
    hv = md5_int_sql("term", 15)
    return (
        "WITH toks AS (SELECT DISTINCT t AS term FROM ("
        " SELECT unnest(string_split(text, ' ')) AS t FROM documents)"
        " WHERE t != ''),"
        f" h AS (SELECT {hv} AS hv FROM toks),"
        f" bk AS (SELECT hv FROM h ORDER BY hv LIMIT {k})"
        " SELECT COUNT(*)::BIGINT AS k_used, MAX(hv)::BIGINT AS kth_min_hash,"
        f" ROUND(CASE WHEN COUNT(*) < {k} THEN COUNT(*)::DOUBLE"
        f"  ELSE (COUNT(*) - 1)::DOUBLE * {float(KMV_M)!r} / MAX(hv)::DOUBLE END, 6)"
        " AS est_distinct FROM bk"
    )
