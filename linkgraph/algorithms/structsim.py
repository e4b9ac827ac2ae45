"""Structural similarity at scale — neighborhood MinHash-LSH pairs.

"Pages that link to (and are linked from) the same places" is the
structural-similarity question behind mirror detection, template/link
-farm clustering, and related-page suggestions. cocitation.py answers
it EXACTLY by enumerating all co-neighbor pairs — O(sum deg(center)^2)
wedges, the right tool up to moderate hub degrees. This module is the
100 TB tier of the same matrix (the graph analogue of the document
dedup ladder in pipeline/dedup.py): MinHash the NEIGHBOR SET of every
vertex, LSH-band the signatures so only probable-similar vertices ever
meet, then verify candidates with the EXACT neighbor-set Jaccard —
linear bucket groupBy + candidate-sized verification instead of a
quadratic wedge join.

    sig_i(v) = min over n in N(v) of (a_i * x(n) + b_i) mod P

with x(n) a base hash of the neighbor id and (a_i, b_i) md5-derived
literals (phash.md5_randint) shared verbatim with the SQL oracle —
the SAME hash family, Mersenne prime, banding and bucket-keying
conventions as pipeline/dedup.minhash_signatures, applied to adjacency
sets instead of shingle sets. Signature mins run as plain JVM
aggregates (neighbor sets are already exploded as edge rows — no UDF,
no per-row Python).

Distributed shape:
- signatures: ONE groupBy(v) with num_hashes MIN aggregates over the
  symmetrized edge relation — partial/final combine, one exchange.
- banding carries only (v, band, bucket); candidate pairs generate
  map-side per bucket (bucket_candidate_pairs, one shuffle), oversized
  pathological buckets skipped exactly like the document tier.
- verification joins ONLY the candidate pairs back against the
  adjacency — O(candidates), not O(pairs).

Exactness: x, a, b < P = 2^31 - 1 keeps a*x + b < 2^62 (BIGINT-exact in
Spark, DuckDB, and the gate); the reported ``jaccard`` is the EXACT
|N(u) ∩ N(v)| / |N(u) ∪ N(v)| in one IEEE division. The LSH layer only
decides WHICH pairs are examined — identically on both engines, so the
driver gate is a full hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import symmetrize
from ..phash import md5_digits_spark_sql
from ..pipeline.dedup import MINHASH_P, _hash_params, bucket_candidate_pairs


def neighborhood_minhash_pairs(
    edges: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket_size: int | None = 100_000,
    portable: bool = False,
    symmetrize_edges: bool = True,
) -> DataFrame:
    """Returns DF(u BIGINT, v BIGINT, common BIGINT, jaccard DOUBLE),
    u < v: vertex pairs sharing at least one LSH band bucket of their
    neighbor-set MinHash signatures whose EXACT neighborhood Jaccard is
    >= ``threshold``. ``portable=True`` draws the base hash from md5
    digits (DuckDB-reproducible); production mode uses xxhash64."""
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    a, b = _hash_params(num_hashes, seed)

    rel = (
        symmetrize(edges) if symmetrize_edges else edges.select("src", "dst").distinct()
    ).select(F.col("src").alias("v"), F.col("dst").alias("n"))

    if portable:
        arg = "concat_ws(':', 'nmh', CAST(n AS STRING))"
        x = md5_digits_spark_sql(f"md5({arg})", 7)
    else:
        x = f"pmod(xxhash64(n), {MINHASH_P})"
    hashed = rel.select("v", F.expr(x).alias("x"))
    mins = [
        F.min(
            (F.col("x") * F.lit(int(a[i])) + F.lit(int(b[i]))) % F.lit(MINHASH_P)
        ).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    sigs = (
        hashed.groupBy("v")
        .agg(*mins)
        .select("v", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"))
        .persist()
    )

    band_key = (
        "md5(concat_ws(',', slice(sig, bd*{r}+1, {r})))"
        if portable
        else "xxhash64(concat_ws(',', slice(sig, bd*{r}+1, {r})))"
    ).format(r=rows_per_band)
    banded = sigs.select(
        "v",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" bd -> struct(bd AS band, {band_key} AS bucket))"
            )
        ).alias("bb"),
    ).select("v", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cands = bucket_candidate_pairs(
        banded, ["band", "bucket"], "v", max_bucket_size, out_a="u", out_b="v"
    )

    deg = rel.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    ru = rel.select(F.col("v").alias("u"), "n")
    common = (
        cands.join(ru, "u")
        .join(rel, ["v", "n"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    du = deg.select(F.col("v").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select("v", F.col("deg").alias("deg_v"))
    return (
        common.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            (
                F.col("common").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
