"""Co-citation and bibliographic coupling — directed-graph similarity.

Beyond-reference operators (the reference's closest shape is the
TriangleCountingVertex.java:52-97 wedge join; its HITS-adjacent use of
the directed web graph motivates these): the two classic link-graph
similarity measures over a DIRECTED edge set,

    cocitation(u, v) = |{w : w->u AND w->v}|   (shared citers)
    coupling(u, v)   = |{w : u->w AND v->w}|   (shared targets)

plus their cosine normalizations common / sqrt(n_u * n_v) where n_x is
the full in-degree (co-citation) or out-degree (coupling) of x. On a
web/import graph these are the "pages cited together" and "pages with
the same bibliography" recommenders; unlike link prediction
(linkpred.py) adjacent pairs are NOT excluded — these are similarity
scores, not missing-edge predictions.

Execution shape: both reduce to ONE self-equi-join of a (center, leaf)
relation on the center — co-citation centers on the citing vertex
(center = src, leaf = dst), coupling on the cited vertex (center =
dst, leaf = src) — followed by a pair groupBy. No loop, no Python.

Scale notes:
- the self-join shuffles on the center; a center's pair set is
  quadratic in its fan-out. ``max_center_degree`` bounds that exactly
  (drop centers above the cap BEFORE the self-join) and DEFAULTS ON
  (10_000), same rationale and same exact-SQL cap as
  linkpred.common_neighbor_scores: a 10^5-fan-out center otherwise
  emits 10^10 pair rows in one group. A dropped co-citation center is
  a page citing >10^4 targets — it co-cites everything and carries no
  similarity signal.
- ``min_common`` prunes map-side-aggregated pairs; real deployments
  keep only pairs sharing >= 2 centers.
- cosine uses the UNCAPPED true degrees (the standard definition);
  common <= both capped fan-ins, so cosine stays in (0, 1].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_CENTER_DEGREE = 10_000


def _pair_scores(
    rel: DataFrame, min_common: int, max_center_degree: int | None
) -> DataFrame:
    """Shared-center pair counts for DF(center, leaf), u < v, plus
    cosine over the leaves' true center counts."""
    # distinct incidence feeds four plan branches (self-join sides, the
    # center cap, leaf counts): persist so it materializes once
    rel = rel.distinct().persist()
    n_leaf = rel.groupBy("leaf").agg(F.count(F.lit(1)).alias("n"))

    centers = rel
    if max_center_degree is not None:
        cdeg = rel.groupBy("center").agg(F.count(F.lit(1)).alias("cdeg"))
        centers = rel.join(
            cdeg.filter(F.col("cdeg") <= max_center_degree).select("center"),
            "center",
        )
    left = centers.select("center", F.col("leaf").alias("u"))
    right = centers.select("center", F.col("leaf").alias("v"))
    pairs = (
        left.join(right, "center")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    if min_common > 1:
        pairs = pairs.filter(F.col("common") >= min_common)
    nu = n_leaf.select(F.col("leaf").alias("u"), F.col("n").alias("n_u"))
    nv = n_leaf.select(F.col("leaf").alias("v"), F.col("n").alias("n_v"))
    return (
        pairs.join(nu, "u")
        .join(nv, "v")
        .select(
            "u",
            "v",
            "common",
            (
                F.col("common")
                / F.sqrt((F.col("n_u") * F.col("n_v")).cast("double"))
            ).alias("cosine"),
        )
    )


def cocitation(
    edges: DataFrame,
    min_common: int = 2,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
) -> DataFrame:
    """DF(u, v, common, cosine), u < v: pairs of vertices cited by at
    least ``min_common`` shared in-neighbors of the directed edge set;
    cosine normalizes by the true in-degrees. Citing vertices with
    out-degree above ``max_center_degree`` are excluded from pair
    generation (``None`` disables the cap)."""
    rel = edges.select(F.col("src").alias("center"), F.col("dst").alias("leaf"))
    return _pair_scores(rel, min_common, max_center_degree)


def bibliographic_coupling(
    edges: DataFrame,
    min_common: int = 2,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
) -> DataFrame:
    """DF(u, v, common, cosine), u < v: pairs of vertices citing at
    least ``min_common`` shared out-neighbors; cosine normalizes by the
    true out-degrees. Cited vertices with in-degree above
    ``max_center_degree`` are excluded (``None`` disables the cap)."""
    rel = edges.select(F.col("dst").alias("center"), F.col("src").alias("leaf"))
    return _pair_scores(rel, min_common, max_center_degree)
