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
(a,b) — then each center's subgraph is aggregated to one row and an
Arrow-batched ``mapInPandas`` runs Bron-Kerbosch with pivoting on its
(small) neighborhood graph, one Python invocation per batch of centers
(see ``_bk_subgraphs``). Work is
proportional to Sum_v |E(N+(v))| (the triangle-join volume); hub cost is
bounded by forward-degree, exactly the reference's ascending-order
pruning.

Hub bound: a center with forward-degree d materializes an O(d^2)-edge
group in ONE task, so centers above ``hub_split_degree`` are decomposed
one level further — group key (v, u) for each u in N+(v), over the
intersection subgraph G[N+(v) ∩ N+(u)] (always the far smaller common
neighborhood). Every maximal clique C of G[N+(v)] with |C| >= 2 and
min(C)=u is a maximal clique of that intersection graph, so the split
path emits a SUPERSET of the per-center maximal cliques (a clique
maximal in the intersection may still be extendable by some w < u
inside N+(v)); any spurious extra is strictly contained in a larger
emitted clique, so ``maximum_cliques``' global answer stays EXACT.
"""

from __future__ import annotations

import logging

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger(__name__)

DEFAULT_HUB_SPLIT_DEGREE = 1024


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


def _bk_subgraphs(sub: DataFrame, prefix_cols: list[str]) -> DataFrame:
    """Enumerate maximal cliques of every group's induced subgraph.

    ``sub`` holds node rows (x, y NULL) and edge rows (x, y) keyed by
    ``prefix_cols``. The group's subgraph is first aggregated into ONE
    row — ``(prefix, ns array<long>, es array<struct<x,y>>)``, bounded
    by the hub-split degree — and BK runs inside ``mapInPandas``: one
    Python/Arrow invocation per BATCH of centers, not one pandas
    DataFrame per center. (The previous per-group ``applyInPandas``
    paid ~ms of pandas scaffolding per center; with millions of
    low-degree centers that overhead, not BK itself, dominated.) The
    clique prefix (the group key vertices) is prepended to every
    result; a group whose subgraph is empty emits the prefix itself
    when the prefix is already a clique of size >= 2 (the hub split's
    empty-intersection {v, u} case)."""
    grouped = sub.groupBy(*prefix_cols).agg(
        # collect_list drops the NULLs the two when()s produce, so node
        # rows land only in ns and edge rows only in es
        F.collect_list(F.when(F.col("y").isNull(), F.col("x"))).alias("ns"),
        F.collect_list(
            F.when(F.col("y").isNotNull(), F.struct("x", "y"))
        ).alias("es"),
    ).select(F.array(*prefix_cols).alias("prefix"), "ns", "es")

    def bk_batches(batches):
        for pdf in batches:
            cliques: list[list[int]] = []
            for prefix, ns, es in zip(pdf["prefix"], pdf["ns"], pdf["es"]):
                pre = [int(v) for v in prefix]
                adj = {int(n): set() for n in ns}
                for e in es:
                    a, b = int(e["x"]), int(e["y"])
                    adj[a].add(b)
                    adj[b].add(a)
                out = [pre + c for c in _bron_kerbosch(adj)]
                if not out and len(pre) > 1:
                    out = [pre]
                cliques.extend(out)
            yield pd.DataFrame(
                {"clique": cliques, "size": [len(c) for c in cliques]}
            ).astype({"size": "int32"})

    return grouped.mapInPandas(bk_batches, schema=_CLIQUE_SCHEMA)


def local_maximal_cliques(
    edges: DataFrame, hub_split_degree: int = DEFAULT_HUB_SPLIT_DEGREE
) -> DataFrame:
    """DF(clique array<long>, size): for every vertex v, the maximal
    cliques of {v} ∪ N+(v) with v as the minimum member (ascending
    order by construction). Every globally maximal clique of size >= 2
    appears (as a maximal clique of its minimum vertex's neighborhood).

    Centers whose forward-degree exceeds ``hub_split_degree`` take the
    two-level (v, u) split (see module docstring): per-task group size
    stays bounded by the common-neighborhood size instead of the hub
    degree, at the cost of possibly emitting non-maximal extras for
    those centers (always subsets of other emitted cliques).
    """
    ce = (
        edges.filter(F.col("dst") < F.col("src"))
        .select(F.col("dst").alias("a"), F.col("src").alias("b"))
        .distinct()
    )
    fdeg = ce.groupBy("a").agg(F.count(F.lit(1)).alias("fdeg"))
    # ONE small driver action decides the plan: hub count + max degree
    # folded into a single agg over the (already tiny) per-center degree
    # frame. The common no-hub case then skips the hub bookkeeping
    # entirely — no `big` frame, no anti-join in the wedge plan (the
    # always-paid fdeg agg + big.count() pair was ~40% of this
    # operator's toy-scale wall time in round 2).
    row = fdeg.agg(
        F.sum((F.col("fdeg") > hub_split_degree).cast("long")).alias("n_big")
    ).first()
    n_big = int(row["n_big"] or 0)
    if n_big:
        log.info(
            "local_maximal_cliques: %d hub center(s) over forward-degree %d "
            "take the two-level split", n_big, hub_split_degree,
        )
    e1 = ce.select(F.col("a").alias("v"), F.col("b").alias("x"))
    if n_big == 0:
        e1_small = e1
    else:
        big = fdeg.filter(F.col("fdeg") > hub_split_degree).select(
            F.col("a").alias("v")
        )
        e1_small = e1.join(big, "v", "left_anti")
    # induced edges among v's forward neighbors (the wedge join) ...
    wedge_small = (
        e1_small.join(e1_small.withColumnRenamed("x", "y"), "v")
        .filter(F.col("x") < F.col("y"))
        .join(ce, (F.col("x") == ce["a"]) & (F.col("y") == ce["b"]))
        .select("v", "x", "y")
    )
    # ... plus every forward neighbor as a node row (isolated neighbors
    # still form 2-cliques {v, x})
    nodes_small = e1_small.select("v", "x", F.lit(None).cast("long").alias("y"))
    sub = nodes_small.unionByName(wedge_small)
    small_out = _bk_subgraphs(sub, ["v"])
    if n_big == 0:
        return small_out
    big_out = _hub_split_cliques(ce, e1.join(big, "v", "left_semi"))
    return small_out.unionByName(big_out)


def _hub_split_cliques(ce: DataFrame, e1_big: DataFrame) -> DataFrame:
    """Two-level decomposition for hub centers: group key (v, u) with
    u in N+(v), over the intersection graph G[N+(v) ∩ N+(u)].

    nodes(v, u, w):  w in N+(v), (u, w) in ce      (the wedge triple)
    edges(v, u, w1, w2): both in the node set, (w1, w2) in ce
    """
    # wedge triples (v, u, w): u, w forward-neighbors of v, u < w, (u,w) edge
    wedge = (
        e1_big.select("v", F.col("x").alias("u"))
        .join(e1_big.select("v", F.col("x").alias("w")), "v")
        .filter(F.col("u") < F.col("w"))
        .join(ce, (F.col("u") == ce["a"]) & (F.col("w") == ce["b"]))
        .select("v", "u", "w")
    )
    # every u in N+(v) gets a group even with empty intersection ({v,u})
    groups = e1_big.select("v", F.col("x").alias("u"))
    nodes = wedge.select("v", "u", F.col("w").alias("x"), F.lit(None).cast("long").alias("y"))
    empty_nodes = groups.select(
        "v", "u", F.lit(None).cast("long").alias("x"), F.lit(None).cast("long").alias("y")
    )
    intra = (
        wedge.select("v", "u", F.col("w").alias("x"))
        .join(wedge.select("v", "u", F.col("w").alias("y")), ["v", "u"])
        .filter(F.col("x") < F.col("y"))
        .join(ce, (F.col("x") == ce["a"]) & (F.col("y") == ce["b"]))
        .select("v", "u", "x", "y")
    )
    sub = nodes.unionByName(empty_nodes).unionByName(intra)
    return _bk_subgraphs(sub, ["v", "u"])


def maximum_cliques(
    edges: DataFrame, hub_split_degree: int = DEFAULT_HUB_SPLIT_DEGREE
) -> DataFrame:
    """The reference aggregator's global answer: all cliques of maximum
    size, ascending vertex order. DF(clique array<long>, size).

    Exact regardless of hub splitting: any non-maximal extra the split
    path emits is strictly smaller than a clique that is also emitted,
    so it never survives the max-size filter."""
    local = local_maximal_cliques(edges, hub_split_degree=hub_split_degree).persist()
    row = local.agg(F.max("size").alias("m")).first()
    m = row["m"] if row and row["m"] is not None else 0
    out = local.filter(F.col("size") == m).distinct()
    # materialize before unpersisting the parent
    result = out.localCheckpoint(eager=True) if m else out
    local.unpersist()
    return result
