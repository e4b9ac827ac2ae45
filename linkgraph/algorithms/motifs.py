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
