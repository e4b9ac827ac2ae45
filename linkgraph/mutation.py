"""Graph mutation between supersteps — add/delete vertices and edges.

Reference contract: ``Vertex.addVertex`` / ``deleteVertex`` calls made
inside compute() flow out of the superstep dataflow on dedicated insert/
delete channels into B-tree insert/delete operators
(JobGenOuterJoin.java:175-190, Vertex.java:581-620, SURVEY.md §3.9).
DataFrames are immutable, so the Spark-native rendition applies the
mutation *between* supersteps: additions union in, deletions anti-join
out — same visibility semantics as the reference, where a vertex
inserted at superstep k is first visible at k+1.

``graph_mutation_reference`` reproduces the shipped GraphMutationVertex
demo (GraphMutationVertex.java:47-70) with these helpers and is checked
against the reference's golden output in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_vertices(vertices: DataFrame, new_vertices: DataFrame) -> DataFrame:
    """Union new vertex rows in; an id that already exists keeps its
    existing row (B-tree insert of a present key is a no-op upsert —
    the reference's insert channel targets fresh ids)."""
    fresh = new_vertices.join(vertices.select("id"), "id", "left_anti")
    return vertices.unionByName(fresh)


def delete_vertices(vertices: DataFrame, ids: DataFrame) -> DataFrame:
    """Remove the vertices whose id appears in ``ids`` (DF with id col)."""
    return vertices.join(ids.select("id"), "id", "left_anti")


def delete_edges_of(edges: DataFrame, ids: DataFrame) -> DataFrame:
    """Remove every edge touching a deleted vertex (the reference drops
    the vertex tuple, so its adjacency disappears and no messages can
    target it)."""
    i = ids.select("id")
    return (
        edges.join(i.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(i.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .select("src", "dst")
    )


def graph_mutation_reference(vertices: DataFrame) -> DataFrame:
    """The reference's GraphMutationVertex demo as a driver-side loop.

    Superstep 1: every vertex with id < 100 is deleted if id%2==0 or
    id%3==0, else it spawns a new vertex 100*id carrying value 0.0.
    Superstep 2: vertex 1900 (if present) is deleted. Returns
    DF(id, value) matching expected/GraphMutation.
    """
    v = vertices.select("id", F.lit(0.0).alias("value"))
    small = v.filter(F.col("id") < 100)
    doomed = small.filter((F.col("id") % 2 == 0) | (F.col("id") % 3 == 0))
    spawners = small.join(doomed.select("id"), "id", "left_anti")
    spawned = spawners.select((F.col("id") * 100).alias("id"), F.col("value"))
    after1 = add_vertices(delete_vertices(v, doomed), spawned)
    after2 = delete_vertices(after1, after1.filter(F.col("id") == 1900))
    return after2
