"""Triangle counting via id-ordered wedge joins — pure DataFrame, no loop.

Reference contract (TriangleCountingVertex.java:52-97): adjacency is
sorted (sortEdges, Vertex.java:519-522); for every wedge centered at b
with endpoints a < b < c both present in b's adjacency, b asks a whether
a's adjacency contains c; each hit counts one triangle attributed to the
SMALLEST vertex a; a global aggregator sums the per-vertex counts
(TriangleCountingAggregator.java:26-56).

Relationally that is exactly two equi-joins (BASELINE.json:6
"degree-ordered wedge joins"):

    lower(b, a): edges where dst < src      (a < b from b's list)
    upper(b, c): edges where dst > src      (c > b from b's list)
    wedges  = lower JOIN upper ON b         -> (a, b, c), a < b < c
    closed  = wedges SEMI-JOIN edges ON (a, c)
    per-vertex = closed GROUP BY a COUNT

With ``symmetrize_edges=True`` (default) the input is made undirected
first and this is the standard ordered triangle count. With
``symmetrize_edges=False`` the adjacency is consumed as-given, which
reproduces the reference's golden output even on its asymmetric clique
fixture. The wedge join shuffles on the center vertex b, so a hub's
wedge set is quadratic in its degree — exactly the skew AQE's skew-join
splitting addresses; the id-ordering already halves the work like the
reference's sorted-adjacency binary search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import vertices_from_edges
from ..partitioning import symmetrize


def triangle_counts(
    edges: DataFrame,
    symmetrize_edges: bool = True,
    include_zero: bool = True,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """Per-vertex triangle counts DF(id, triangles); each triangle
    (a < b < c) is attributed to its smallest vertex a (reference
    attribution)."""
    e = symmetrize(edges) if symmetrize_edges else edges.select("src", "dst").distinct()
    lower = e.filter(F.col("dst") < F.col("src")).select(
        F.col("src").alias("b"), F.col("dst").alias("a")
    )
    upper = e.filter(F.col("dst") > F.col("src")).select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    wedges = lower.join(upper, "b").select("a", "c")
    # inner join, not semi: distinct centers b yield distinct triangles
    # sharing the same (a, c) pair, and each must be counted. ``e`` is
    # deduplicated above, so the join cannot inflate counts.
    closing = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    closed = wedges.join(closing, ["a", "c"], "inner")
    per_vertex = closed.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("triangles")
    )
    if include_zero:
        verts = vertices if vertices is not None else vertices_from_edges(edges)
        per_vertex = (
            verts.select("id")
            .join(per_vertex, "id", "left_outer")
            .select("id", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"))
        )
    return per_vertex


def triangle_total(
    edges: DataFrame, symmetrize_edges: bool = True
) -> int:
    """Global triangle count (the reference's global aggregator value)."""
    row = (
        triangle_counts(edges, symmetrize_edges=symmetrize_edges, include_zero=False)
        .agg(F.sum("triangles").alias("t"))
        .first()
    )
    return int(row["t"] or 0)


def _participation(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(undirected simple edge set, per-vertex triangle PARTICIPATION).

    Unlike :func:`triangle_counts` (reference attribution: each triangle
    counted once, at its smallest vertex), clustering coefficients need
    each triangle counted at ALL THREE corners. Same ordered wedge join,
    with the center retained and the closed (a, b, c) rows exploded to
    their corners — one extra narrow stage over the closed set (whose
    size is the triangle count, not the wedge count).
    """
    e = symmetrize(edges).filter(F.col("src") != F.col("dst"))
    lower = e.filter(F.col("dst") < F.col("src")).selectExpr("src AS b", "dst AS a")
    upper = e.filter(F.col("dst") > F.col("src")).selectExpr("src AS b", "dst AS c")
    wedges = lower.join(upper, "b").select("a", "b", "c")
    closing = e.selectExpr("src AS a", "dst AS c")
    closed = wedges.join(closing, ["a", "c"], "inner")
    corners = closed.select(
        F.explode(F.array("a", "b", "c")).alias("id")
    )
    per_vertex = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    return e, per_vertex


def clustering_coefficients(
    edges: DataFrame,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected
    simple graph (self-loops dropped, direction ignored).

    DF(id, degree, triangles, coeff) where ``triangles`` counts the
    triangles THROUGH the vertex and
    ``coeff = 2*triangles / (degree*(degree-1))`` (0 for degree < 2).
    Scale shape: one wedge join (shuffles on the center — the same
    hub-quadratic term every triangle algorithm has, AQE skew-split
    territory) plus one degree aggregate; no iteration.
    """
    e, per_vertex = _participation(edges)
    degrees = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    verts = vertices.select("id") if vertices is not None else vertices_from_edges(edges)
    return (
        verts.join(degrees, "id", "left_outer")
        .join(per_vertex, "id", "left_outer")
        .selectExpr(
            "id",
            "COALESCE(degree, 0L) AS degree",
            "COALESCE(triangles, 0L) AS triangles",
            "CASE WHEN COALESCE(degree, 0L) >= 2"
            " THEN 2.0D * COALESCE(triangles, 0L) / (degree * (degree - 1))"
            " ELSE 0.0D END AS coeff",
        )
    )


def transitivity(edges: DataFrame) -> DataFrame:
    """Global transitivity (one row: DF(transitivity)) —
    3*triangles / wedges over the undirected simple graph, the standard
    closed-to-open wedge ratio. 0.0 when the graph has no wedges."""
    e, per_vertex = _participation(edges)
    # sum of per-corner participation already equals 3 * n_triangles
    tri3 = per_vertex.agg(F.sum("triangles").alias("t3"))
    wedge = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.expr("(d * (d - 1)) div 2")).alias("w"))
    )
    return tri3.crossJoin(wedge).selectExpr(
        "CASE WHEN COALESCE(w, 0) > 0"
        " THEN COALESCE(t3, 0) / CAST(w AS DOUBLE) ELSE 0.0D END AS transitivity"
    )
