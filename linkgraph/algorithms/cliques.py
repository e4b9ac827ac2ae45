"""Maximal/maximum cliques — id-ordered neighborhood enumeration.

Reference contract (maximalclique/MaximalCliqueVertex.java:60-330,
SURVEY.md §4.5): superstep 1 sends, for every edge u->w with w < u, the
tail of u's sorted adjacency to w; superstep 2 has each vertex v run a
depth-first clique search over the local subgraph of its larger
neighbors; the global MaximalCliqueAggregator keeps the cliques of
MAXIMUM size (MaximalCliqueAggregator.java:50-63), each listed in
ascending vertex order. The effective edge relation is
``edge(x, y), x < y  iff  x appears in adj(y)`` (the DFS's isClique
check consults the larger endpoint's list only). The reference's
per-vertex text outputs additionally depend on partition-local pruning
state (largestCliqueSizeSoFar is never reset between vertices of a
task) — a partition-layout artifact, not a semantic contract — so the
engine reproduces the aggregator's global answer.

Spark shape: the local subgraphs materialize via the same id-ordered
wedge join as triangle counting — (v,a),(v,b) forward edges joined with
(a,b) — then one Arrow-batched ``applyInPandas`` per center vertex runs
Bron-Kerbosch with pivoting on its (small) neighborhood graph. Work is
proportional to Sum_v |E(N+(v))| (the triangle-join volume); hub cost is
bounded by forward-degree, exactly the reference's ascending-order
pruning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bron_kerbosch(adj: dict) -> list:
    """All maximal cliques of the undirected graph ``adj`` (dict of
    node -> set of neighbors). Iterative BK with greedy pivoting."""
    cliques = []
    stack = [(set(), set(adj.keys()), set())]
    while stack:
        r, p, x = stack.pop()
        if not p and not x:
            if r:
                cliques.append(sorted(r))
            continue
        pivot = max(p | x, key=lambda u: len(adj[u] & p))
        for v in sorted(p - adj[pivot]):
            stack.append((r | {v}, p & adj[v], x & adj[v]))
            p = p - {v}
            x = x | {v}
    return cliques


_CLIQUE_SCHEMA = T.StructType(
    [
        T.StructField("clique", T.ArrayType(T.LongType()), False),
        T.StructField("size", T.IntegerType(), False),
    ]
)


def local_maximal_cliques(edges: DataFrame) -> DataFrame:
    """DF(clique array<long>, size): for every vertex v, the maximal
    cliques of {v} ∪ N+(v) with v as the minimum member (ascending
    order by construction). Every globally maximal clique of size >= 2
    appears (as a maximal clique of its minimum vertex's neighborhood).
    """
    ce = (
        edges.filter(F.col("dst") < F.col("src"))
        .select(F.col("dst").alias("a"), F.col("src").alias("b"))
        .distinct()
    )
    e1 = ce.select(F.col("a").alias("v"), F.col("b").alias("x"))
    # induced edges among v's forward neighbors (the wedge join) ...
    wedge = (
        e1.join(e1.withColumnRenamed("x", "y"), "v")
        .filter(F.col("x") < F.col("y"))
        .join(ce, (F.col("x") == ce["a"]) & (F.col("y") == ce["b"]))
        .select("v", "x", "y")
    )
    # ... plus every forward neighbor as a node row (isolated neighbors
    # still form 2-cliques {v, x})
    nodes = e1.select("v", "x", F.lit(None).cast("long").alias("y"))
    sub = nodes.unionByName(wedge)

    def enumerate_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = int(pdf["v"].iloc[0])
        node_set = set(pdf["x"].astype("int64"))
        adj = {u: set() for u in node_set}
        ee = pdf.dropna(subset=["y"])
        for x, y in zip(ee["x"].astype("int64"), ee["y"].astype("int64")):
            adj[x].add(y)
            adj[y].add(x)
        out = [[v] + c for c in _bron_kerbosch(adj)]
        return pd.DataFrame(
            {"clique": out, "size": [len(c) for c in out]}
        ).astype({"size": "int32"})

    return sub.groupBy("v").applyInPandas(enumerate_group, schema=_CLIQUE_SCHEMA)


def maximum_cliques(edges: DataFrame) -> DataFrame:
    """The reference aggregator's global answer: all cliques of maximum
    size, ascending vertex order. DF(clique array<long>, size)."""
    local = local_maximal_cliques(edges).persist()
    row = local.agg(F.max("size").alias("m")).first()
    m = row["m"] if row and row["m"] is not None else 0
    out = local.filter(F.col("size") == m).distinct()
    # materialize before unpersisting the parent
    result = out.localCheckpoint(eager=True) if m else out
    local.unpersist()
    return result
