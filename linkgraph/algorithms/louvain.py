"""One-level Louvain — synchronous greedy modularity moves.

Completes the community-detection story next to label propagation
(frequency-greedy) and Newman modularity scoring (stats.modularity):
the local-move phase of Louvain (Blondel et al. 2008), the quality
function the web-graph community literature actually optimizes. Each
round, every vertex evaluates moving to each NEIGHBORING community and
takes the move with the largest modularity gain; all moves apply
synchronously. Classic Louvain is sequential (one vertex at a time);
the synchronous variant is the standard distributed re-expression
(e.g. Spark/GraphX "Louvain-style" implementations) and is what a BSP
engine can honestly compute — we run a FIXED round count, making the
output a pure function of the input.

Exact arithmetic: for v in community a, moving to community c changes
modularity by

    dQ = (e_vc - e_va') / m  -  deg_v * (vol_c - vol_a') / (2 m^2)

with e_vX = v's edges into X (v excluded), vol_a' = vol_a - deg_v.
Multiplying by the positive constant 2m^2 gives the INTEGER score

    score(c) = 2m * (e_vc - e_va') - deg_v * (vol_c - vol_a')

so every comparison (argmax over candidate communities, the move/stay
test score > 0, and the smallest-community-id tie-break) is exact
integer arithmetic — no float summation order, no ROUND ties —
evaluated in DECIMAL(38,0) (Spark) / HUGEINT-capable arithmetic
(DuckDB) because deg_v * vol_c exceeds int64 on 10^11-edge graphs
(the collocations convention).

Pure synchronous moves oscillate (two singletons that each pick the
other swap labels forever — the textbook pathology). We use the
standard distributed-Louvain mitigation (Sotera's DGA implementation
popularized it): EVEN rounds only accept moves to a LOWER community
id, ODD rounds only to a HIGHER one — any swap pair is broken because
the two directions can never fire in the same round, while every
profitable merge stays reachable on alternating rounds. Direction
filtering happens BEFORE the argmax so a blocked best candidate never
shadows an eligible one; ties break to the smallest (even) / largest
(odd) candidate id. Rounds are therefore deterministic and the fixed
round count keeps the oracle an exact unrolled replay.

Distributed shape per round: one degree-weighted community-volume
aggregate, one edge⋈labels join + (v, community) count for the
edge-to-community weights, one struct-max argmax per vertex — three
partial/final exchanges, all keyed, nothing collected; labels
checkpoint with fresh stats (superstep.local_checkpoint_fresh_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import choose_partitions, vertices_from_edges
from ..partitioning import symmetrize
from ..superstep import iteration_conf, local_checkpoint_fresh_stats

DEC = "decimal(38,0)"


def greedy_modularity_communities(
    edges: DataFrame,
    rounds: int = 3,
    vertices: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns DF(id BIGINT, community BIGINT): labels after ``rounds``
    synchronous greedy-modularity move rounds over the symmetrized
    simple graph, initialized to singleton communities. Isolated
    vertices keep their singleton label."""
    spark = edges.sparkSession
    p = choose_partitions(edges, lambda: edges.count(), num_partitions)
    if vertices is None:
        vertices = vertices_from_edges(edges)

    with iteration_conf(spark, p):
        sym = symmetrize(edges).repartition(p, "src").persist()
        two_m = sym.count()  # = sum of degrees = 2m

        deg = sym.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        lab = local_checkpoint_fresh_stats(
            vertices.select("id", F.col("id").alias("community")).repartition(
                p, "id"
            )
        )

        for _r in range(rounds):
            vol = (
                lab.join(deg, "id")
                .groupBy("community")
                .agg(F.sum("deg").alias("vol"))
            )
            # v's edge count into each adjacent community
            evc = (
                sym.join(
                    lab.select(
                        F.col("id").alias("dst"), F.col("community").alias("c2")
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"), "c2")
                .agg(F.count(F.lit(1)).alias("e"))
            )
            # current community context: a, deg_v, vol_a' = vol_a - deg_v,
            # e_va' = v's edges into its own community (0 if none)
            cur = (
                lab.join(deg, "id", "left_outer")
                .join(
                    vol.select(
                        F.col("community"), F.col("vol").alias("vol_a")
                    ),
                    "community",
                    "left_outer",
                )
                .join(
                    evc.select(
                        "id", F.col("c2").alias("community"), F.col("e").alias("e_a")
                    ),
                    ["id", "community"],
                    "left_outer",
                )
                .select(
                    "id",
                    F.col("community").alias("a"),
                    F.coalesce("deg", F.lit(0)).alias("deg_v"),
                    (
                        F.coalesce("vol_a", F.lit(0)) - F.coalesce("deg", F.lit(0))
                    ).alias("vol_rest"),
                    F.coalesce("e_a", F.lit(0)).alias("e_a"),
                )
            )
            # candidate scores: 2m*(e_vc - e_va') - deg_v*(vol_c - vol_a');
            # direction filter first (even rounds: c2 < a, odd: c2 > a)
            direction = (
                (F.col("c2") < F.col("a"))
                if _r % 2 == 0
                else (F.col("c2") > F.col("a"))
            )
            cand = (
                evc.join(cur, "id")
                .filter(direction)
                .join(
                    vol.select(F.col("community").alias("c2"), "vol"), "c2"
                )
                .select(
                    "id",
                    "a",
                    "c2",
                    (
                        F.lit(two_m).cast(DEC)
                        * (F.col("e") - F.col("e_a")).cast(DEC)
                        - F.col("deg_v").cast(DEC)
                        * (F.col("vol") - F.col("vol_rest")).cast(DEC)
                    ).alias("score"),
                )
            )
            # argmax score with a deterministic id tie-break: toward
            # the move direction (smallest id on even rounds, largest
            # on odd) — struct max over (score, signed c2)
            tiekey = (-F.col("c2")) if _r % 2 == 0 else F.col("c2")
            sign = -1 if _r % 2 == 0 else 1
            best = (
                cand.groupBy("id")
                .agg(
                    F.max(
                        F.struct(F.col("score"), tiekey.alias("tk"))
                    ).alias("b")
                )
                .select(
                    "id",
                    F.col("b.score").alias("score"),
                    (F.lit(sign) * F.col("b.tk")).alias("c_new"),
                )
            )
            lab = local_checkpoint_fresh_stats(
                lab.join(best, "id", "left_outer")
                .select(
                    "id",
                    F.when(
                        F.col("score") > 0, F.col("c_new")
                    )
                    .otherwise(F.col("community"))
                    .alias("community"),
                )
                .repartition(p, "id")
            )

        sym.unpersist()
    return lab.select("id", "community")
