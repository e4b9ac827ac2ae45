"""Minimum spanning forest via distributed Borůvka rounds.

The MSF of the link graph is the cheapest skeleton that keeps every
component connected — the backbone extractor (visual summarization of
dependency graphs, hierarchical clustering via single-linkage, network
design). Borůvka (1926) is THE dataflow-parallel MST algorithm: every
round, each component selects its minimum-weight outgoing edge, all
selected edges join the forest simultaneously, and touching components
merge — the component count at least halves per round, so O(log V)
rounds total.

Determinism / uniqueness: edges are ranked by the TOTAL order
``(weight, u, v)`` (with ``u < v`` canonical endpoints, the pair is
unique per edge, so no ties exist). Under a total edge order the
minimum spanning forest is unique, which makes the output a pure
function of the input — and lets the driver gate verify it against an
independently-computed Kruskal oracle (a recursive CTE in DuckDB):
both algorithms must produce the identical edge set.

Component merging: the edges selected in one round form a graph over
component labels whose connected components are exactly the merge
groups (each group is a pseudo-tree: out-degree one per component and,
because the edge order is total, every cycle is a mutual-minimum
2-cycle). Rather than re-deriving pointer-jumping machinery here, the
merge runs :func:`linkgraph.algorithms.cc.connected_components` on
that contracted graph — after round one it is tiny (≤ one edge per
surviving component), so the inner loop is a few sub-second supersteps
over a frame that shrinks geometrically.

Distributed shape (the 100 TB story): the canonical weighted edge
relation is built once, hash-partitioned, and persisted; each round
re-labels it with current component ids (two co-partitioned joins
against the label frame), takes one groupBy(component).min(struct) —
a two-phase partial/final aggregate, one exchange — and unions the
O(components) selected edges into the forest accumulator.
Cross-component edges only shrink round over round; no driver-side
state beyond loop counters and O(rounds) forest frame handles.

Reference parity: the reference ships no MST, but this is the
per-round global-aggregator + contraction shape of its Pregelix
vertex programs (SURVEY.md §3.4, §3.10) applied to the classic
textbook workload its graph module stops short of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import choose_partitions
from ..superstep import iteration_conf
from .cc import connected_components


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str | None = None,
    num_partitions: int | None = None,
    max_rounds: int = 40,
) -> tuple[DataFrame, int]:
    """Returns (DF(u BIGINT, v BIGINT, weight BIGINT), rounds) — the
    unique minimum spanning forest of the UNDIRECTED graph under the
    total edge order ``(weight, u, v)``.

    Edges are canonicalized to ``u = least(src, dst) <
    v = greatest(src, dst)``; self-loops are dropped; parallel edges
    keep their minimum weight. ``weight_col`` must be integral
    (micro-unit convention — exact in BIGINT on both engines); when
    ``None`` every edge weighs 1 and the result is a spanning forest
    of minimum edge count per component (still unique via the
    ``(u, v)`` tie order).
    """
    spark = edges.sparkSession
    p = choose_partitions(edges, lambda: edges.count(), num_partitions)

    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    with iteration_conf(spark, p):
        canon = (
            edges.select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
                w.alias("weight"),
            )
            .filter(F.col("u") != F.col("v"))
            .groupBy("u", "v")
            .agg(F.min("weight").alias("weight"))
            .repartition(p, "u")
            .localCheckpoint(eager=True)
        )

        # labels: vertex -> current component (starts as itself)
        lab = (
            canon.select(F.col("u").alias("id"))
            .unionAll(canon.select(F.col("v").alias("id")))
            .distinct()
            .select("id", F.col("id").alias("comp"))
            .repartition(p, "id")
            .localCheckpoint(eager=True)
        )

        forest_frames: list[DataFrame] = []
        rounds = 0
        for _ in range(max_rounds):
            # edges bridging two current components, labeled both sides
            lu = lab.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
            lv = lab.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
            bridge = (
                canon.join(lu, "u")
                .join(lv, "v")
                .filter(F.col("cu") != F.col("cv"))
                .localCheckpoint(eager=True)
            )
            if bridge.isEmpty():
                break
            rounds += 1

            # every component picks its minimum outgoing edge under the
            # total order (weight, u, v): struct-min IS that order, one
            # partial/final aggregate per side riding a single exchange
            cand = F.struct("weight", "u", "v", "cu", "cv")
            offers = bridge.select(F.col("cu").alias("c"), cand.alias("m")).unionAll(
                bridge.select(F.col("cv").alias("c"), cand.alias("m"))
            )
            picked = (
                offers.groupBy("c")
                .agg(F.min("m").alias("m"))
                .select("m.weight", "m.u", "m.v", "m.cu", "m.cv")
                .distinct()  # mutual-minimum pairs pick the same edge twice
                .localCheckpoint(eager=True)
            )
            forest_frames.append(picked.select("u", "v", "weight"))

            # contract: merge groups = connected components of the
            # picked edges viewed over component labels (tiny graph)
            merge, _res = connected_components(
                picked.select(F.col("cu").alias("src"), F.col("cv").alias("dst")),
                track_messages=False,
            )
            new_comp = merge.select(
                F.col("id").alias("comp"), F.col("component").alias("nc")
            )
            lab = (
                lab.join(new_comp, "comp", "left_outer")
                .select("id", F.coalesce("nc", "comp").alias("comp"))
                .repartition(p, "id")
                .localCheckpoint(eager=True)
            )

        if forest_frames:
            out = forest_frames[0]
            for fdf in forest_frames[1:]:
                out = out.unionAll(fdf)
        else:
            out = spark.createDataFrame([], "u LONG, v LONG, weight LONG")
    return out.select("u", "v", "weight"), rounds
