"""Rectangle (4-cycle) counting via the opposite-pair identity.

Beyond-reference operator (same family as the reference's
degree-ordered wedge join, TriangleCountingVertex.java:52-97, one motif
up): counts the 4-cycles of the UNDIRECTED simple graph. Rectangles are
the bipartite-friendly cohesion motif — link farms, co-purchase blocks,
and mirror clusters show up as rectangle-dense regions even when
triangles are absent (bipartite graphs have none), which is what makes
this the standard spam/community signal on web-scale link graphs next
to triangle counting.

Identity: every 4-cycle a-x-b-y-a is determined by its two OPPOSITE
pairs {a, b} and {x, y}, so with codeg(u, v) = |N(u) ∩ N(v)|,

    rect(a)    = sum_{c} C(codeg(a, c), 2)     # a's opposite vertices c
    total      = sum_{u<v} C(codeg(u, v), 2) / 2

(each cycle contributes once per opposite pair: twice to the total sum,
once to each of its four vertices' rect()). Cycles need not be induced
(chords are allowed) — the standard counting convention.

Execution shape: ONE self-equi-join of the symmetrized (center, leaf)
incidence on the center builds common-neighbor pair counts — identical
to cocitation (cocitation.py) over the undirected graph — then one
integer expression C(codeg, 2) and one explode-free groupBy per
endpoint. All JVM-side, exact BIGINT arithmetic.

Scale notes:
- a center's wedge fan-out is quadratic in its degree;
  ``max_center_degree`` bounds it exactly (drop hub centers BEFORE the
  self-join) and DEFAULTS ON (10_000) — the same cap, rationale, and
  exact-SQL spelling as linkpred/cocitation. A dropped center is a
  10^5-degree hub that closes rectangles with everything; its counts
  are noise and its wedge set alone would be 10^10 rows.
- the pair frame is the big intermediate: O(#co-neighbor pairs). It is
  never collected and never re-joined against anything wider than the
  two per-endpoint aggregates; ``min_codeg=2`` drops the (majority)
  pairs that close nothing before the combinatorial term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import vertices_from_edges
from ..partitioning import symmetrize

DEFAULT_MAX_CENTER_DEGREE = 10_000


def rectangle_counts(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
) -> DataFrame:
    """Returns DF(id BIGINT, rect BIGINT): the number of 4-cycles of the
    symmetrized simple graph each vertex participates in (0-filled over
    the vertex universe). Middle (wedge-center) vertices with degree
    above ``max_center_degree`` are excluded from wedge generation
    (``None`` disables the cap)."""
    sym = symmetrize(edges)
    if vertices is None:
        vertices = vertices_from_edges(edges)

    # the incidence feeds four plan branches (both self-join sides, the
    # degree cap, the vertex zero-fill base when derived): persist so the
    # symmetrized distinct relation materializes once, not per branch
    rel = sym.select(
        F.col("src").alias("center"), F.col("dst").alias("leaf")
    ).persist()
    if max_center_degree is not None:
        cdeg = rel.groupBy("center").agg(F.count(F.lit(1)).alias("cdeg"))
        rel = rel.join(
            cdeg.filter(F.col("cdeg") <= max_center_degree).select("center"),
            "center",
        )

    left = rel.select("center", F.col("leaf").alias("u"))
    right = rel.select("center", F.col("leaf").alias("v"))
    pairs = (
        left.join(right, "center")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("codeg"))
        .filter(F.col("codeg") >= 2)
        .select(
            "u",
            "v",
            (F.col("codeg") * (F.col("codeg") - 1) / 2)
            .cast("long")
            .alias("pr"),
        )
    )
    per_vertex = (
        pairs.select(F.col("u").alias("id"), "pr")
        .unionAll(pairs.select(F.col("v").alias("id"), "pr"))
        .groupBy("id")
        .agg(F.sum("pr").alias("rect"))
    )
    return vertices.select("id").join(per_vertex, "id", "left_outer").select(
        "id", F.coalesce("rect", F.lit(0)).cast("long").alias("rect")
    )
