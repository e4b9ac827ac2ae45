"""Graph sampling — seed selection + neighbor expansion to a target
fill rate.

Reference contract (GraphSampleVertex.java:156-190, SURVEY.md §4.5):
each superstep, unselected vertices self-select with probability
1/seed_interval; selected vertices mark each out-neighbor with
probability 1/sampling_interval; iteration stops once the globally
aggregated selected fraction reaches the target rate (the reference's
GlobalSamplingAggregator + fillingRate check).

The reference draws from ``java.util.Random`` (run-dependent). Ours
replaces the PRNG with counter-based hashing — ``xxhash64(id, seed,
superstep) % interval == 0`` — so the sample is a pure function of
(graph, seed): reproducible across runs, partitionings, and cluster
sizes, with the same per-superstep selection probabilities. All
selection logic is JVM-side column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import CheckpointManager
from ..graph import choose_partitions, vertices_from_edges
from ..partitioning import build_adjacency
from ..superstep import LoopResult, StepResult, iterate, iteration_conf


def graph_sample(
    edges: DataFrame,
    target_rate: float = 0.5,
    seed_interval: int = 10,
    sampling_interval: int = 2,
    seed: int = 42,
    vertices: DataFrame | None = None,
    num_partitions: int | None = None,
    max_supersteps: int = 50,
    ckpt: CheckpointManager | None = None,
    resume: bool = True,
    track_messages: bool = True,
) -> tuple[DataFrame, LoopResult]:
    """Returns (DF(id, selected BOOLEAN), LoopResult); the selected set
    reaches ``target_rate`` of all vertices (or max_supersteps)."""
    p = choose_partitions(edges, lambda: edges.count(), num_partitions)
    if vertices is None:
        vertices = vertices_from_edges(edges)
    verts = vertices.select("id").repartition(p, "id")

    with iteration_conf(edges.sparkSession, p):
        adj = build_adjacency(edges, num_partitions=p).persist()
        adj.count()

    init = verts.withColumn("selected", F.lit(False)).withColumn(
        "newly", F.lit(False)
    )

    def superstep(state: DataFrame, k: int) -> StepResult:
        cur = state.select("id", "selected", "newly")
        # expansion: vertices selected last superstep mark a subset of
        # their out-neighbors (deterministic per-edge coin)
        senders = cur.filter(F.col("newly"))
        marked = (
            adj.join(senders, adj["src"] == senders["id"])
            .select(F.col("src"), F.explode("dsts").alias("id"))
            .filter(F.pmod(F.xxhash64("src", "id", F.lit(seed), F.lit(k)), F.lit(sampling_interval)) == 0)
            .select("id")
            .distinct()
        )
        # seeding: unselected vertices self-select with the seed coin
        new = (
            cur.drop("newly")
            .join(marked.withColumn("_m", F.lit(True)), "id", "left_outer")
            .select(
                "id",
                F.col("selected").alias("_old"),
                (
                    F.col("selected")
                    | F.coalesce(F.col("_m"), F.lit(False))
                    | (F.pmod(F.xxhash64("id", F.lit(seed), F.lit(k)), F.lit(seed_interval)) == 0)
                ).alias("selected"),
                F.col("_m").isNotNull().cast("long").alias("_msgs"),
            )
            .select(
                "id",
                "selected",
                (F.col("selected") & ~F.col("_old")).alias("newly"),
                "_msgs",
            )
            .withColumn("_changed", F.col("newly"))
            # _delta carries the global fill count for the stop check
            .withColumn("_delta", F.col("selected").cast("double"))
        )
        return StepResult(state=new, messages=marked)

    def done(s) -> bool:
        filled = (s.delta or 0.0) / max(s.rows, 1)
        return filled >= target_rate

    result = iterate(
        init.withColumn("_changed", F.lit(False)).withColumn("_delta", F.lit(0.0)),
        superstep,
        converged=done,
        max_supersteps=max_supersteps,
        ckpt=ckpt,
        resume=resume,
        track_messages=track_messages,
        num_partitions=p,
    )
    adj.unpersist()
    return result.state.select("id", "selected"), result
