"""Maximal matching — local-minimum edge coins (Luby on the line graph).

A maximal matching (no two matched edges share a vertex; every
unmatched edge has a matched endpoint) is the edge-side
symmetry-breaking primitive next to the vertex-side MIS
(algorithms/mis.py) — the building block for distributed vertex cover
(2-approximation = matched endpoints), graph coarsening for multilevel
partitioners, and degree-constrained pair assignment. The reference
ships no matching job, but the per-round shape is exactly its
compute()/voteToHalt superstep (SURVEY.md §3.10): the live frontier
shrinks geometrically and each round is a constant number of keyed
exchanges.

Rule (Israeli–Itai style, the line-graph mirror of Luby): each round,
every LIVE edge (both endpoints unmatched) draws a deterministic coin
from ``(u, v, round, seed)``; an edge joins the matching when its coin
is the UNIQUE minimum among the live edges at BOTH endpoints. Two
adjacent edges can never both win (they share a vertex, where only one
can be the unique minimum); a coin collision at a vertex merely defers
that vertex's edges to the next round, where the coins differ — so
matched-ness is guaranteed by construction, and the expected round
count is O(log n) by the standard Luby argument (the globally minimum
live edge always wins, and in expectation a constant fraction of live
edges loses an endpoint per round).

Determinism: the coin is the counter-based hash of phash.py —
``portable=True`` draws md5 digit terms reproducible in DuckDB (the
driver oracle unrolls the rounds in SQL), production mode one xxhash64
per live edge per round. Both modes yield a valid maximal matching, a
pure function of (graph, seed), independent of partitioning and
cluster size.

Distributed shape (the 100 TB design): the symmetrized edge relation
is persisted hash-partitioned once; each round touches only live
edges — one coin projection, one per-vertex min aggregate, one
argmin-uniqueness check, one per-edge pair count — all keyed
partial/final aggregates, nothing collected. Work per round is
proportional to the LIVE edge set, which Luby shrinks geometrically;
the mate relation stays id-partitioned for the final join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import CheckpointManager
from ..graph import choose_partitions, vertices_from_edges
from ..partitioning import symmetrize
from ..phash import md5_digits_spark_sql as _md5_digits_spark_sql
from ..phash import md5_int_sql as _md5_int_sql

UNMATCHED = -1


def _mm_arg(u_sql: str, v_sql: str, k: int, seed: int) -> str:
    return (
        f"concat_ws(':', 'mm', CAST({u_sql} AS STRING),"
        f" CAST({v_sql} AS STRING), '{k}', '{seed}')"
    )


def matching_coin_sql(u_sql: str, v_sql: str, k: int, seed: int) -> str:
    """Engine-neutral SQL (valid in Spark SQL AND DuckDB) for live edge
    ``(u, v)``'s non-negative priority at round ``k`` — the oracle-side
    md5 digit spelling; the engine's portable mode computes the
    identical value via the faster conv() spelling."""
    return _md5_int_sql(_mm_arg(u_sql, v_sql, k, seed))


def _spark_coin(u_sql: str, v_sql: str, k: int, seed: int, portable: bool) -> str:
    arg = _mm_arg(u_sql, v_sql, k, seed)
    if portable:
        return _md5_digits_spark_sql(f"md5({arg})", 6)
    return f"pmod(xxhash64({arg}), {2 ** 62})"


def maximal_matching(
    edges: DataFrame,
    seed: int = 42,
    vertices: DataFrame | None = None,
    num_partitions: int | None = None,
    max_supersteps: int = 60,
    ckpt: CheckpointManager | None = None,
    resume: bool = True,
    portable: bool = False,
) -> tuple[DataFrame, "LoopResult"]:
    """Returns (DF(id BIGINT, mate BIGINT), LoopResult) — a maximal
    matching of the UNDIRECTED simple graph: ``mate`` is the matched
    partner's id, or -1 for unmatched vertices (isolated vertices and
    the leftovers maximality allows). Self-loops are dropped (a vertex
    cannot match itself).

    Deterministic in (graph, seed); both coin modes yield a valid
    maximal matching but generally DIFFERENT matchings.
    """
    from ..superstep import LoopResult, StepResult, iterate, iteration_conf

    p = choose_partitions(edges, lambda: edges.count(), num_partitions)
    if vertices is None:
        vertices = vertices_from_edges(edges)

    with iteration_conf(edges.sparkSession, p):
        # canonical u < v live-edge universe (one row per undirected edge)
        canon = (
            symmetrize(edges)
            .filter(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .repartition(p, "u")
            .persist()
        )
        canon.count()

    init = vertices.select("id").withColumn(
        "mate", F.lit(UNMATCHED).cast("long")
    ).repartition(p, "id")

    def superstep(state: DataFrame, k: int) -> StepResult:
        live = state.filter(F.col("mate") == UNMATCHED).select("id")
        le = (
            canon.join(live.select(F.col("id").alias("u")), "u")
            .join(live.select(F.col("id").alias("v")), "v")
            .select(
                "u",
                "v",
                F.expr(_spark_coin("u", "v", k, seed, portable)).alias("ck"),
            )
        )
        # incidence: one row per (endpoint, live edge)
        inc = le.select(F.col("u").alias("vid"), "u", "v", "ck").unionByName(
            le.select(F.col("v").alias("vid"), "u", "v", "ck")
        )
        vm = inc.groupBy("vid").agg(
            F.min("ck").alias("m1"), F.count(F.lit(1)).alias("nle")
        )
        # edges achieving the per-vertex minimum; keep only vertices
        # where that minimum is UNIQUE (ties defer the whole vertex)
        am = inc.join(vm.select("vid", "m1"), "vid").filter(
            F.col("ck") == F.col("m1")
        )
        uniq = am.groupBy("vid").agg(
            F.count(F.lit(1)).alias("_n"),
            F.first("u").alias("u"),
            F.first("v").alias("v"),
        ).filter(F.col("_n") == 1)
        # an edge wins when it is the unique argmin at BOTH endpoints
        wins = (
            uniq.groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") == 2)
            .select("u", "v")
        )
        mates = wins.select(
            F.col("u").alias("id"), F.col("v").alias("m")
        ).unionByName(wins.select(F.col("v").alias("id"), F.col("u").alias("m")))
        # live edges SURVIVING this round's matches — their endpoints
        # are still blocked, so the loop must continue; the count rides
        # the state observation as _delta (no extra job)
        mid = mates.select("id")
        le_next = le.join(
            mid.select(F.col("id").alias("u")), "u", "left_anti"
        ).join(mid.select(F.col("id").alias("v")), "v", "left_anti")
        blocked = (
            le_next.select(F.col("u").alias("id"))
            .unionByName(le_next.select(F.col("v").alias("id")))
            .distinct()
            .withColumn("_blk", F.lit(True))
        )
        new = (
            state.join(mates, "id", "left_outer")
            .join(vm.select(F.col("vid").alias("id"), "nle"), "id", "left_outer")
            .join(blocked, "id", "left_outer")
            .select(
                "id",
                F.coalesce(F.col("m"), F.col("mate")).alias("mate"),
                F.col("m").isNotNull().alias("_changed"),
                F.coalesce(F.col("nle"), F.lit(0)).cast("long").alias("_msgs"),
                F.when(F.col("_blk").isNotNull(), F.lit(1.0))
                .otherwise(F.lit(0.0))
                .alias("_delta"),
            )
        )
        return StepResult(state=new)

    result = iterate(
        init.withColumn("_changed", F.lit(False)).withColumn("_delta", F.lit(1.0)),
        superstep,
        converged=lambda s: (s.delta or 0.0) == 0.0,
        max_supersteps=max_supersteps,
        ckpt=ckpt,
        resume=resume,
        num_partitions=p,
    )
    canon.unpersist()
    return result.state.select("id", "mate"), result
