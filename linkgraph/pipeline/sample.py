"""Deterministic corpus sampling — weighted priority sampling and
per-stratum uniform sampling.

Training-data curation constantly subsamples a corpus: proportional to
a quality/length weight (token-budget-proportional mixing) or uniformly
within strata (per-language balancing). The reference has no sampling
beyond the graph-fill sampler (GraphSampleVertex.java:156-190,
SURVEY.md §4.5); these operators extend the same counter-based-hash
determinism to the documents table, so a sample is a pure function of
(corpus, seed) — reproducible across runs, partitionings, and cluster
sizes, with no RNG state to ship.

- ``weighted_sample``: priority sampling (Duffield/Lund/Thorup): each
  row draws u ~ U[0,1) from a hash of its id and keeps key = u/weight;
  the k SMALLEST keys form a without-replacement sample biased toward
  heavy rows. Executes as one scan + ``TakeOrderedAndProject`` (each
  partition keeps its local top-k, the driver merges k·p candidate
  rows) — no full sort, no shuffle of the corpus, linear at 100 TB.
- ``stratified_sample``: per-stratum uniform top-k by hashed key via a
  ``row_number`` window. Spark's WindowGroupLimit pushes the k-filter
  map-side, so the exchange carries at most k·p rows per stratum, not
  the corpus.

Both coins come in two modes (the phash.py convention): production
``portable=False`` = one xxhash64 per row (``pmod`` by 2^60 is exactly
uniform: 2^60 divides 2^64); ``portable=True`` = md5-digit coins
reproducible in any engine with md5 + integer arithmetic, making the
ENTIRE sample oracle-checkable in SQL (__spark_entry__ gates both
operators against DuckDB running the same expressions). The two modes
draw different samples; both are deterministic in (corpus, seed).

Floats never cross the gate: the selection key u/weight is an
IEEE-correctly-rounded double of identical inputs in both engines (so
the selected SET matches exactly), and the key itself is dropped from
the output — only integer/string columns leave the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..phash import md5_digits_spark_sql as _md5_digits_spark_sql
from ..phash import md5_digits_sql as _md5_digits_sql

#: 16^15 = 2^60 — the md5 15-digit draw's exclusive upper bound; also
#: the pmod modulus for the xxhash64 fast coin (2^60 | 2^64, so the
#: reduction is exactly uniform over a uniform 64-bit input).
U_DENOM = 16 ** 15


def _u_arg(tag: str, id_sql: str, seed: int) -> str:
    return f"concat_ws(':', '{tag}', CAST({id_sql} AS STRING), '{seed}')"


def uniform_sql(tag: str, id_sql: str, seed: int) -> str:
    """Engine-neutral SQL (valid in Spark SQL AND DuckDB) for the
    deterministic u ~ U[0,1) draw of row ``id_sql`` — the oracle-side
    spelling (md5 digit terms); the engine's portable mode computes the
    identical value via the faster conv() spelling."""
    digits = _md5_digits_sql(f"md5({_u_arg(tag, id_sql, seed)})", 15)
    return f"(CAST({digits} AS DOUBLE) / {U_DENOM})"


def _spark_uniform(tag: str, id_sql: str, seed: int, portable: bool) -> str:
    arg = _u_arg(tag, id_sql, seed)
    if portable:
        digits = _md5_digits_spark_sql(f"md5({arg})", 15)
        return f"(CAST({digits} AS DOUBLE) / {U_DENOM})"
    return f"(CAST(pmod(xxhash64({arg}), {U_DENOM}) AS DOUBLE) / {U_DENOM})"


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(id_col, weight_col) — a deterministic priority sample of ``k``
    rows, inclusion probability increasing in ``weight_col``.

    Rows with non-positive weight are excluded (their key would be
    negative/undefined); ties beyond the hash draw break by id.
    """
    u = F.expr(_spark_uniform("ws", id_col, seed, portable))
    key = u / F.col(weight_col).cast("double")
    return (
        docs.filter(F.col(weight_col) > 0)
        .select(id_col, weight_col, key.alias("_key"))
        .orderBy(F.col("_key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("_key")
    )


def proportional_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    portable: bool = False,
    default_rate: float = 0.0,
) -> DataFrame:
    """(id_col, strata_col) — Bernoulli corpus mixing: keep each row of
    stratum ``s`` with probability ``rates[s]`` (``default_rate`` for
    unlisted strata). The training-data mixing primitive: dial each
    source/language to its target proportion in one deterministic scan
    — no shuffle, no state; at 100 TB this is a pure filter.

    The keep decision compares the integer hash draw against
    ``floor(rate * 2^60)`` — integer-exact in both engines, so the kept
    SET is oracle-checkable in portable mode. Per-row probability is
    exact to 2^-60.
    """
    arg = _u_arg("ps", id_col, seed)
    if portable:
        u_int = _md5_digits_spark_sql(f"md5({arg})", 15)
    else:
        u_int = f"pmod(xxhash64({arg}), {U_DENOM})"
    thr = F.lit(int(default_rate * U_DENOM))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(int(r * U_DENOM))).otherwise(thr)
    return docs.select(id_col, strata_col).filter(F.expr(u_int) < thr)


def proportional_threshold_sql(strata_col: str, rates: dict[str, float],
                               default_rate: float = 0.0) -> str:
    """Engine-neutral CASE expression for the integer keep-threshold of
    :func:`proportional_sample` (embed next to ``uniform_sql``'s digit
    terms in the oracle)."""
    whens = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {int(r * U_DENOM)}"
        for s, r in sorted(rates.items())
    )
    return f"(CASE {whens} ELSE {int(default_rate * U_DENOM)} END)"


def stratified_sample(
    docs: DataFrame,
    k_per_stratum: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(id_col, strata_col) — a deterministic uniform sample of up to
    ``k_per_stratum`` rows from every stratum (strata smaller than k
    are kept whole)."""
    u = F.expr(_spark_uniform("ss", id_col, seed, portable))
    w = Window.partitionBy(strata_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        docs.select(id_col, strata_col, F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= k_per_stratum)
        .drop("_rn")
    )
