"""Closed-triad census — the directed-motif refinement of triangle
counting.

The reference counts undirected triangles via its degree/id-ordered
wedge join (TriangleCountingVertex.java:40-77, SURVEY.md §4.4); this
operator keeps that enumeration and adds the DIRECTED classification on
top: every closed triad (a triangle in the underlying undirected graph)
is assigned its Wasserman-Faust MAN label — ``030T`` transitive,
``030C`` cyclic, ``120D``/``120U``/``120C`` one-mutual, ``210``
two-mutual, ``300`` all-mutual (the seven types with all three dyads
connected; the nine open/null types are derivable from vertex, dyad and
wedge counts alone and are not triangle-shaped work).

Shape, and why it scales:

1. pair codes — one groupBy over the distinct directed edge list
   collapses each unordered pair (x < y) to a direction code
   ``1`` (x->y only), ``2`` (y->x only), ``3`` (mutual): code =
   SUM(DISTINCT bit), a partial/final aggregate.
2. triangle enumeration — the id-ordered wedge join of triangles.py
   over the pair relation (a < b < c), carrying the three codes.
3. classification — one CASE expression per closed row; the label
   logic is a SHARED SQL string (``TRIAD_CASE_SQL``) evaluated by both
   Spark and the DuckDB oracle, so the driver gate is exact by
   construction.

No iteration, no UDFs; cost is the triangle join itself, which the
engine already pays for triangle counting. Output is <= 7 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLOSED_TRIAD_TYPES = ["030C", "030T", "120C", "120D", "120U", "210", "300"]

# label logic over pair codes c_ab, c_bc, c_ac for a triangle a < b < c;
# code 1 = low->high arc only, 2 = high->low only, 3 = mutual. The
# one-mutual subcases name the outsider z of the mutual dyad: both arcs
# z->dyad = 120D (z is an out-star, the D of 021D), both dyad->z = 120U,
# mixed = 120C. Valid Spark SQL and DuckDB SQL verbatim.
TRIAD_CASE_SQL = """
CASE
  WHEN c_ab = 3 AND c_bc = 3 AND c_ac = 3 THEN '300'
  WHEN CAST(c_ab = 3 AS INT) + CAST(c_bc = 3 AS INT) + CAST(c_ac = 3 AS INT) = 2
    THEN '210'
  WHEN c_ab = 3 THEN CASE WHEN c_bc = 2 AND c_ac = 2 THEN '120D'
                          WHEN c_bc = 1 AND c_ac = 1 THEN '120U'
                          ELSE '120C' END
  WHEN c_bc = 3 THEN CASE WHEN c_ab = 1 AND c_ac = 1 THEN '120D'
                          WHEN c_ab = 2 AND c_ac = 2 THEN '120U'
                          ELSE '120C' END
  WHEN c_ac = 3 THEN CASE WHEN c_ab = 2 AND c_bc = 1 THEN '120D'
                          WHEN c_ab = 1 AND c_bc = 2 THEN '120U'
                          ELSE '120C' END
  WHEN (c_ab = 1 AND c_bc = 1 AND c_ac = 2)
    OR (c_ab = 2 AND c_bc = 2 AND c_ac = 1) THEN '030C'
  ELSE '030T'
END
""".strip()


def closed_triad_census(edges: DataFrame) -> DataFrame:
    """DF(triad_type STRING, n BIGINT), one row per closed MAN type
    (all seven present; absent types report 0), sorted by type.

    ``edges`` is the DIRECTED edge list (src, dst); self-loops and
    duplicates are dropped.
    """
    spark = edges.sparkSession
    d = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    pairs = (
        d.select(
            F.least("src", "dst").alias("x"),
            F.greatest("src", "dst").alias("y"),
            F.when(F.col("src") < F.col("dst"), F.lit(1))
            .otherwise(F.lit(2))
            .alias("bit"),
        )
        .groupBy("x", "y")
        .agg(F.sum_distinct(F.col("bit")).alias("code"))
    )
    ab = pairs.selectExpr("x AS a", "y AS b", "code AS c_ab")
    bc = pairs.selectExpr("x AS b", "y AS c", "code AS c_bc")
    ac = pairs.selectExpr("x AS a", "y AS c", "code AS c_ac")
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    counts = (
        tri.selectExpr(f"({TRIAD_CASE_SQL}) AS triad_type")
        .groupBy("triad_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    types = spark.createDataFrame(
        [(t,) for t in CLOSED_TRIAD_TYPES], "triad_type string"
    )
    return (
        types.join(counts, "triad_type", "left_outer")
        .select(
            "triad_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("triad_type")
    )


ALL_TRIAD_TYPES = [
    "003", "012", "021C", "021D", "021U", "030C", "030T", "102",
    "111D", "111U", "120C", "120D", "120U", "201", "210", "300",
]


def triad_census(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """The FULL 16-type Holland-Leinhardt triad census —
    DF(triad_type STRING, n BIGINT), one row per MAN type, sorted.

    Complementary counting (Batagelj & Mrvar, "A subquadratic triad
    census algorithm", 2001): only the CLOSED types need triangle-shaped
    work (:func:`closed_triad_census`); every open type follows from
    exact integer aggregates —

    - dyad census: M mutual / A asymmetric pairs (one groupBy);
    - per-vertex dyad degrees (m, ao, ai) -> the six wedge-class
      moments (sum C(m,2), C(ao,2), C(ai,2), ao*ai, m*ai, m*ao);
    - open wedge counts = moments minus each closed type's fixed
      per-corner wedge contributions;
    - one-connected-dyad counts (012/102) = dyad-count * (n-2) minus
      the triples already counted with >= 2 connected dyads;
    - 003 = C(n,3) minus everything else.

    Everything is a partial/final aggregate or a scalar crossJoin; the
    only shuffle-heavy step is the triangle join the closed census
    already pays. Counts stay BIGINT, which bounds n at ~3.8M vertices
    before C(n,3) overflows int64 — beyond that, flip the arithmetic
    chain to DECIMAL(38,0) (the dataflow is unchanged; the driver gate
    pins BIGINT because the fixtures are far inside the bound).

    ``vertices`` supplies the vertex universe (isolated vertices count
    toward 003/012/102); default = endpoints of ``edges``.
    """
    from ..graph import vertices_from_edges

    spark = edges.sparkSession
    if vertices is None:
        vertices = vertices_from_edges(edges)
    d = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    pairs = (
        d.select(
            F.least("src", "dst").alias("x"),
            F.greatest("src", "dst").alias("y"),
            F.when(F.col("src") < F.col("dst"), F.lit(1))
            .otherwise(F.lit(2))
            .alias("bit"),
        )
        .groupBy("x", "y")
        .agg(F.sum_distinct(F.col("bit")).alias("code"))
    )

    nrow = vertices.select(F.count(F.lit(1)).cast("long").alias("n"))
    dyads = pairs.select(
        F.sum((F.col("code") == 3).cast("long")).alias("M"),
        F.sum((F.col("code") != 3).cast("long")).alias("A"),
    )

    # per-vertex dyad degrees: mutual m, asym-out ao, asym-in ai
    roles = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("x").alias("v"),
                    (F.col("code") == 3).cast("long").alias("m"),
                    (F.col("code") == 1).cast("long").alias("ao"),
                    (F.col("code") == 2).cast("long").alias("ai"),
                ),
                F.struct(
                    F.col("y").alias("v"),
                    (F.col("code") == 3).cast("long").alias("m"),
                    (F.col("code") == 2).cast("long").alias("ao"),
                    (F.col("code") == 1).cast("long").alias("ai"),
                ),
            )
        ).alias("r")
    ).select("r.v", "r.m", "r.ao", "r.ai")
    perv = roles.groupBy("v").agg(
        F.sum("m").alias("m"), F.sum("ao").alias("ao"), F.sum("ai").alias("ai")
    )
    wedges = perv.select(
        # integer div keeps every moment BIGINT end to end (a double
        # SUM goes inexact past 2^53 at extreme vertex counts)
        F.sum(F.expr("m * (m - 1) div 2")).alias("W201"),
        F.sum(F.expr("ao * (ao - 1) div 2")).alias("W021D"),
        F.sum(F.expr("ai * (ai - 1) div 2")).alias("W021U"),
        F.sum(F.expr("ao * ai")).alias("W021C"),
        F.sum(F.expr("m * ai")).alias("W111D"),
        F.sum(F.expr("m * ao")).alias("W111U"),
    )

    # closed census as one scalar row of conditional sums
    ab = pairs.selectExpr("x AS a", "y AS b", "code AS c_ab")
    bc = pairs.selectExpr("x AS b", "y AS c", "code AS c_bc")
    ac = pairs.selectExpr("x AS a", "y AS c", "code AS c_ac")
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    closed = tri.selectExpr(f"({TRIAD_CASE_SQL}) AS t").select(
        *[
            F.sum((F.col("t") == t).cast("long")).alias(f"c{t}")
            for t in CLOSED_TRIAD_TYPES
        ]
    )

    scalars = (
        nrow.crossJoin(dyads).crossJoin(wedges).crossJoin(closed)
        # NULL-safe: an empty graph yields NULL aggregates
        .selectExpr(
            "n",
            *[f"COALESCE({c}, 0) AS {c}" for c in ["M", "A"]],
            *[
                f"COALESCE({c}, 0) AS {c}"
                for c in ["W201", "W021D", "W021U", "W021C", "W111D", "W111U"]
            ],
            *[f"COALESCE(c{t}, 0) AS c{t}" for t in CLOSED_TRIAD_TYPES],
        )
    )
    counts = scalars.selectExpr(
        "n",
        "M", "A",
        "c030C AS n030C", "c030T AS n030T", "c120C AS n120C",
        "c120D AS n120D", "c120U AS n120U", "c210 AS n210", "c300 AS n300",
        "W201 - 3 * c300 - c210 AS n201",
        "W111D - c210 - 2 * c120D - c120C AS n111D",
        "W111U - c210 - 2 * c120U - c120C AS n111U",
        "W021D - c120D - c030T AS n021D",
        "W021U - c120U - c030T AS n021U",
        "W021C - c030T - 3 * c030C - c120C AS n021C",
    ).selectExpr(
        "*",
        "M * (n - 2) - 2 * n201 - n111D - n111U"
        " - 3 * n300 - 2 * n210 - (n120D + n120U + n120C) AS n102",
        "A * (n - 2) - 2 * (n021D + n021U + n021C) - (n111D + n111U)"
        " - 3 * (n030T + n030C) - 2 * (n120D + n120U + n120C) - n210 AS n012",
    ).selectExpr(
        "*",
        "n * (n - 1) * (n - 2) div 6 - (n012 + n102 + n021D + n021U + n021C"
        " + n030T + n030C + n111D + n111U + n120D + n120U + n120C"
        " + n201 + n210 + n300) AS n003",
    )
    stack_args = ", ".join(f"'{t}', CAST(n{t} AS BIGINT)" for t in ALL_TRIAD_TYPES)
    return (
        counts.selectExpr(f"stack({len(ALL_TRIAD_TYPES)}, {stack_args}) AS (triad_type, n)")
        .orderBy("triad_type")
    )
