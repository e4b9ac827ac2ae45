"""Declarative vertex programs — the user-facing compute() surface.

The reference's whole user API is ``Vertex.compute(msgIterator)`` plus
``sendMsg``/``sendMsgToAllEdges`` and ``voteToHalt``
(pregelix-api Vertex.java:102-119, 220-241, 248-290): users write one
vertex kernel and the runtime owns scatter, combine, join, and halting.
This module is the Spark rendition: instead of an imperative per-vertex
function (which would force row-at-a-time Python), the user supplies
**column expressions** for the three parts of a gather-scatter step —

- ``message_expr``   what an active vertex sends along each out-edge
                     (refs: ``value``, vertex attrs, ``outdeg``, and the
                     edge weight column when ``weight_col`` is set);
- ``combine_agg``    the associative message combiner, an aggregate over
                     the column ``msg`` (the reference's MessageCombiner
                     3-stage local/shuffle/final pipeline is exactly
                     Spark's partial+final hash aggregate);
- ``update_expr``    the new vertex value from the old ``value`` and the
                     combined ``msg`` (NULL when no messages arrived —
                     the reference's empty msgIterator);

and the engine builds the superstep: cached salted-CSR adjacency join,
explode-scatter, partial/final combine, co-partitioned state join,
observed metrics, checkpoint/resume — everything ``iterate`` provides.
Vertices "vote to halt" declaratively: under ``plan="delta"`` only
vertices whose ``changed_expr`` fired re-scatter (the reference's
message-driven wake-up, JobGenInnerJoin.java:330-375); under
``plan="outer"`` every vertex is visited every superstep
(JobGenOuterJoin.java:236-407).

For semantics a single expression can't say, ``update_kernel`` accepts
an Arrow-batched pandas function (pdf with columns id/value/msg/attrs ->
new-value Series) — vectorized, never per-row Python.

No algorithm in this file is hard-coded: PageRank, SSSP, CC, LPA and
user-defined variants are all definable against this API alone (see
linkgraph/examples.py and tests/test_vertex_program.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager
from .graph import choose_partitions, vertices_from_edges
from .metrics import SuperstepMetrics
from .partitioning import build_adjacency, symmetrize
from .superstep import (
    LoopResult,
    StepResult,
    iterate,
    iteration_conf,
)


@dataclass
class VertexProgram:
    """A declarative gather-scatter spec. Expressions may reference:

    - ``F.col("value")``  — the vertex's current value (old value inside
      ``update_expr`` / ``changed_expr`` / ``delta_expr``);
    - ``F.col("_new")``   — the updated value (only in ``changed_expr``
      and ``delta_expr``);
    - ``F.col("msg")``    — the combined incoming message inside
      ``update_expr`` (NULL when the vertex received nothing);
    - ``F.col("outdeg")`` — the sender's total out-degree inside
      ``message_expr``;
    - ``F.col("superstep")`` — the current superstep number (the
      reference's getSuperstep()) inside ``update_expr`` /
      ``changed_expr`` / the mutation expressions ("superstep" is a
      reserved column name on the update side);
    - any vertex-attribute column supplied via ``vertex_attrs``;
    - ``F.col(weight_col)`` — the per-edge weight inside
      ``message_expr`` when ``weight_col`` is set.
    """

    init_expr: Column                 # over id + attrs -> initial value
    message_expr: Column              # what active vertices send per out-edge
    combine_agg: Column               # aggregate over column "msg"
    update_expr: Column               # (value, msg, attrs) -> new value
    plan: str = "outer"               # "outer" | "delta" | "auto"
    changed_expr: Column | None = None   # (_new, value) -> bool; default _new != value
    delta_expr: Column | None = None     # (_new, value) -> double convergence metric
    initial_active_expr: Column | None = None  # delta plan: senders in superstep 1
    weight_col: str | None = None     # per-edge weight column (row-per-edge scatter)
    symmetrize_edges: bool = False    # treat the graph as undirected
    update_kernel: Callable | None = None  # pandas (pdf -> Series) replacing update_expr
    # Pregel's voteToHalt-overridden-by-message rule (Vertex.java:248-290:
    # "a halted vertex is reactivated when it receives a message"): under
    # plan="delta"/"auto", the next superstep's sender set is the SET
    # UNION of vertices whose value changed and vertices that received a
    # combined message this superstep — the reference materializes that
    # union with its sorted set-union join over the live-vertex index
    # (JobGenInnerJoin.java:336-339, IndexNestedLoopSetUnion*:259+282 LoC);
    # here it is one boolean OR on columns the superstep already computes,
    # so it costs nothing. Leave False for monotone fixpoints (min/max/or:
    # a woken-but-unchanged vertex's resend is a no-op there, only extra
    # messages); set True for programs whose halting state is a projection
    # of the value (relay/request-reply patterns), where a quiescent
    # vertex must still forward what it was sent.
    wake_on_message: bool = False
    # Declarative graph-mutation channels — the reference's
    # compute()-issued Vertex.addVertex / deleteVertex calls
    # (Vertex.java:581-620), which flow out of the superstep dataflow on
    # dedicated insert/delete channels into B-tree insert/delete
    # operators (JobGenOuterJoin.java:175-190). Spark rendition: the
    # expressions are evaluated over each UPDATED vertex row (columns
    # id, value = old value, _new = updated value, superstep, attrs) and
    # the emitted rows are applied to the state BETWEEN supersteps —
    # a vertex inserted at superstep k is first visible at k+1, same
    # visibility rule as the reference.
    #
    # - ``mutate_add_expr``: ARRAY<STRUCT<id, value>> of vertices to
    #   insert. Inserting an id that already exists is a no-op upsert
    #   (B-tree insert of a present key); duplicate spawns of one id
    #   collapse to one row. Inserted vertices start live (_changed /
    #   active true — they scatter next superstep), with NULL attrs and
    #   no out-edges (the adjacency is fixed; the reference's addVertex
    #   carries edges only when the user builds them, which this
    #   surface does not model).
    # - ``mutate_delete_expr``: ARRAY<id> of vertices to delete (own id
    #   or others'). Deleted vertices leave the state, so they neither
    #   scatter nor receive (in-flight messages to them drop in the
    #   state join — the reference drops the vertex tuple with its
    #   adjacency). A deletion does NOT count as a change: a superstep
    #   whose only effect is deletion still ends the run if nothing
    #   changed (matches the reference, where deleted vertices simply
    #   stop existing and the rest have voted to halt).
    #
    # Emitting an empty array (or NULL) mutates nothing. Mutation
    # supersteps re-evaluate the update pipeline once per channel, so
    # reserve these for programs that actually mutate.
    mutate_add_expr: Column | None = None
    mutate_delete_expr: Column | None = None
    # Declarative ``terminatePartition()`` — the reference lets a vertex
    # kernel terminate its WHOLE partition mid-run (Vertex.java
    # terminatePartition / VertexPartitioner; exercised by
    # EarlyTerminationVertex.java:42-60): every vertex in the partition
    # freezes at its current value and is skipped for the rest of the
    # run. The imperative original stops partition processing at the
    # point of the call (order-dependent inside the partition); the
    # deterministic Spark rendition evaluates the predicate over every
    # pre-update row of the superstep — columns id, value (old), msg
    # (combined, NULL if none), superstep, attrs — and freezes each
    # fired partition BEFORE this superstep's update applies, exactly
    # the fixture's observable semantics (the firing partition keeps
    # its pre-superstep values). Frozen vertices never scatter, never
    # update, never count as changed; messages addressed to them drop.
    #
    # ``partition_expr`` names the partition a vertex belongs to; None
    # means the engine's own vertex partition, pmod(hash(id), p) — the
    # same murmur3 HashPartitioning ``repartition(p, "id")`` uses. Pass
    # an expression (e.g. ``pmod(id, 4)``) to model the reference's
    # pluggable VertexPartitioner, as its goldens' VLongWritable
    # id%partitions layout does. The fired-partition set is a <=p-row
    # broadcast — no extra shuffle.
    terminate_partition_expr: Column | None = None
    partition_expr: Column | None = None
    # plan="auto": the runtime OUTER->INNER switch (the reference's
    # JobGen.switchPlan, JobGen.java:1012-1020, driven by IDriver's plan
    # choice): supersteps scatter from EVERY vertex (outer) until the
    # changed fraction observed at the previous superstep drops below
    # this threshold, then permanently switch to changed-only scatter
    # (inner/delta; the reference bulk-loads the live-vertex B-tree at
    # the same point). Requires delta-safe semantics: resending an
    # UNCHANGED vertex's value must be a no-op under combine+update
    # (true for monotone programs — min/max/or fixpoints).
    switch_threshold: float = 0.5


def run_vertex_program(
    edges: DataFrame,
    program: VertexProgram,
    *,
    vertices: DataFrame | None = None,
    vertex_attrs: DataFrame | None = None,
    num_partitions: int | None = None,
    max_supersteps: int = 100,
    stop_when: Callable[[SuperstepMetrics], bool] | None = None,
    chunk_size: int = 4096,
    ckpt: CheckpointManager | None = None,
    resume: bool = True,
    track_messages: bool = True,
) -> tuple[DataFrame, LoopResult]:
    """Execute a :class:`VertexProgram`. Returns (DF(id, value, *attrs),
    LoopResult with per-superstep metrics).

    ``stop_when`` defaults to ``stats.changed == 0`` (every vertex voted
    to halt and no message woke anything — the reference's global
    termination check, Driver.java:342-344).
    """
    if program.plan not in ("outer", "delta", "auto"):
        raise ValueError(f"unknown plan {program.plan!r}")
    scale = 2 if program.symmetrize_edges else 1
    p = choose_partitions(edges, lambda: scale * edges.count(), num_partitions)
    if vertices is None:
        vertices = vertices_from_edges(edges)
    verts = vertices.select("id").repartition(p, "id")

    e = symmetrize(edges) if program.symmetrize_edges else edges
    with iteration_conf(edges.sparkSession, p):
        if program.weight_col is not None:
            # row-per-edge adjacency: the scatter needs per-edge weights
            adj = (
                e.select("src", "dst", F.col(program.weight_col).cast("double").alias(program.weight_col))
                .repartition(p, "src")
                .persist()
            )
        else:
            adj = build_adjacency(
                e.select("src", "dst"), num_partitions=p, chunk_size=chunk_size
            ).persist()
        adj.count()

    attr_cols: list[str] = []
    if vertex_attrs is not None:
        attr_cols = [c for c in vertex_attrs.columns if c != "id"]
        verts = verts.join(vertex_attrs, "id", "left_outer")

    tracks_active = program.plan in ("delta", "auto")
    tracks_frozen = program.terminate_partition_expr is not None
    part_expr = (
        program.partition_expr
        if program.partition_expr is not None
        else F.pmod(F.hash(F.col("id")), F.lit(p))
    )
    init = verts.select("id", *attr_cols, program.init_expr.alias("value"))
    if tracks_frozen:
        init = init.withColumn("_frozen", F.lit(False))
    if tracks_active:
        active0 = (
            program.initial_active_expr
            if program.initial_active_expr is not None
            else F.lit(True)
        )
        init = init.withColumn("active", active0)

    # driver-side plan state for plan="auto" (the reference's
    # switchPlan decision lives in the driver loop too)
    plan_state = {"changed_frac": 1.0, "switched_at": None}

    changed_expr = (
        program.changed_expr
        if program.changed_expr is not None
        else F.col("_new") != F.col("value")
    )

    def scatter(senders: DataFrame) -> DataFrame:
        if program.weight_col is not None:
            per_edge = adj.join(senders, adj["src"] == senders["id"])
            return per_edge.select(
                F.col("dst").alias("id"), program.message_expr.alias("msg")
            )
        joined = adj.join(senders, adj["src"] == senders["id"])
        # message computed once per (sender, chunk) then fanned out —
        # sendMsgToAllEdges semantics (Vertex.java:236-241)
        return joined.select(
            F.explode("dsts").alias("id"), program.message_expr.alias("msg")
        )

    def superstep(state: DataFrame, k: int) -> StepResult:
        if program.plan == "delta":
            senders = state.filter(F.col("active"))
        elif program.plan == "auto":
            # outer until the live fraction justifies the delta filter;
            # the switch is permanent, like the reference's one-way
            # jobgen swap to JobGenInnerJoin
            if plan_state["switched_at"] is None and (
                k > 1 and plan_state["changed_frac"] < program.switch_threshold
            ):
                plan_state["switched_at"] = k
            senders = (
                state.filter(F.col("active"))
                if plan_state["switched_at"] is not None
                else state
            )
        else:
            senders = state
        if tracks_frozen:
            senders = senders.filter(~F.col("_frozen"))
        msgs = scatter(senders).groupBy("id").agg(program.combine_agg.alias("msg"))

        base = state.drop("active") if tracks_active else state
        joined = base.join(msgs, "id", "left_outer").withColumn(
            "superstep", F.lit(k)
        )
        if tracks_frozen:
            # partitions fired THIS superstep freeze before the update
            # applies (EarlyTermination fixture semantics); the fired
            # set is <= p rows, broadcast back onto the state
            fired = (
                joined.filter(
                    (~F.col("_frozen")) & program.terminate_partition_expr
                )
                .select(part_expr.alias("_vp_term_part"))
                .distinct()
            )
            joined = (
                joined.join(
                    F.broadcast(fired),
                    part_expr == F.col("_vp_term_part"),
                    "left_outer",
                )
                .withColumn(
                    "_frozen",
                    F.col("_frozen") | F.col("_vp_term_part").isNotNull(),
                )
                .drop("_vp_term_part")
            )
        if program.update_kernel is not None:
            new_val = _kernel_column(joined, program.update_kernel, attr_cols)
        else:
            new_val = program.update_expr
        if tracks_frozen:
            # frozen vertices skip the update and can never report a
            # change (voteToHalt is permanent for a terminated partition)
            new_val = F.when(F.col("_frozen"), F.col("value")).otherwise(new_val)
        upd = joined.select(
            "id",
            *attr_cols,
            F.col("value"),
            new_val.alias("_new"),
            F.col("superstep"),
            F.col("msg").isNotNull().cast("long").alias("_vp_got_msg"),
            *([F.col("_frozen")] if tracks_frozen else []),
        )
        step_changed = (
            F.when(F.col("_frozen"), F.lit(False)).otherwise(changed_expr)
            if tracks_frozen
            else changed_expr
        )
        out_cols = [
            F.col("id"),
            *[F.col(c) for c in attr_cols],
            F.col("_new").alias("value"),
            step_changed.alias("_vp_changed"),
            *([F.col("_frozen")] if tracks_frozen else []),
            # combined-message count rides the state observation (one
            # job per superstep; see superstep.py on why the message
            # frame itself must not carry a CollectMetrics node)
            F.col("_vp_got_msg").alias("_msgs"),
        ]
        if program.delta_expr is not None:
            out_cols.append(program.delta_expr.alias("_delta"))
        new = upd.select(*out_cols).withColumn(
            "_changed", F.col("_vp_changed")
        )
        if tracks_active:
            active_next = F.col("_vp_changed")
            if program.wake_on_message:
                # live-set = changed ∪ messaged (the reference's set-union
                # wake-up of halted-but-messaged vertices)
                active_next = active_next | (F.col("_msgs") == 1)
            if tracks_frozen:
                # a message cannot wake a terminated partition
                active_next = active_next & ~F.col("_frozen")
            new = new.withColumn("active", active_next)
        new = new.drop("_vp_changed")
        # mutation channels (insert/delete between supersteps — see the
        # VertexProgram field docs). Deletes first, then inserts: an id
        # deleted and re-inserted in one superstep lands as a fresh row.
        if program.mutate_delete_expr is not None:
            dels = upd.select(
                F.explode(program.mutate_delete_expr).alias("id")
            ).distinct()
            new = new.join(dels, "id", "left_anti")
        if program.mutate_add_expr is not None:
            spawned = upd.select(F.explode(program.mutate_add_expr).alias("_nv"))
            proj = []
            for f in new.schema.fields:
                if f.name == "id":
                    proj.append(F.col("_nv.id").cast(f.dataType).alias("id"))
                elif f.name == "value":
                    proj.append(F.col("_nv.value").cast(f.dataType).alias("value"))
                elif f.name == "active":
                    proj.append(F.lit(True).alias("active"))
                elif f.name == "_changed":
                    proj.append(F.lit(True).alias("_changed"))
                elif f.name == "_msgs":
                    proj.append(F.lit(0).cast(f.dataType).alias("_msgs"))
                elif f.name == "_frozen":
                    proj.append(F.lit(False).alias("_frozen"))
                elif f.name == "_delta":
                    proj.append(F.lit(0.0).cast(f.dataType).alias("_delta"))
                else:  # static vertex attrs: NULL for spawned vertices
                    proj.append(F.lit(None).cast(f.dataType).alias(f.name))
            adds = (
                spawned.select(*proj)
                .dropDuplicates(["id"])
                # upsert semantics: an existing id keeps its row
                .join(new.select("id"), "id", "left_anti")
            )
            new = new.unionByName(adds)
        return StepResult(state=new, messages=msgs)

    if stop_when is not None:
        stop = stop_when
    elif program.wake_on_message:
        # a wake program is live while anything changed OR a message is
        # still in flight (it will wake its target next superstep) — the
        # reference's termination check is exactly "no live vertices and
        # no messages" (Driver.java:342-344 via the terminationState bit)
        if not track_messages:
            raise ValueError(
                "wake_on_message needs track_messages=True for the "
                "default stop condition (messages in flight keep the "
                "run live); pass an explicit stop_when to override"
            )
        stop = lambda s: s.changed == 0 and (s.messages or 0) == 0  # noqa: E731
    else:
        stop = lambda s: s.changed == 0  # noqa: E731

    def stop_and_observe(stats: SuperstepMetrics) -> bool:
        if stats.changed is not None and stats.rows:
            plan_state["changed_frac"] = stats.changed / stats.rows
        return stop(stats)

    result = iterate(
        init,
        superstep,
        converged=stop_and_observe,
        max_supersteps=max_supersteps,
        ckpt=ckpt,
        resume=resume,
        track_messages=track_messages,
        num_partitions=p,
    )
    adj.unpersist()
    # surfaced for inspection/tests: the superstep at which plan="auto"
    # swapped outer -> delta (None = never switched / not auto)
    result.plan_switched_at = plan_state["switched_at"]
    out = result.state.select("id", *attr_cols, "value")
    return out, result


def _kernel_column(joined: DataFrame, kernel: Callable, attr_cols: list[str]):
    """Wrap a pandas update kernel as a vectorized (Arrow-batched) UDF
    over the joined (id, value, msg, attrs) frame."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    cols = ["id", "value", "msg", *attr_cols]

    # no type hints: this module uses `from __future__ import
    # annotations`, which stringifies hints that the pandas_udf eval-type
    # inference then can't resolve; pass the scalar eval type explicitly
    def _k(pdf):
        return kernel(pdf)

    _k.__annotations__ = {"pdf": pd.DataFrame, "return": pd.Series}
    k_udf = pandas_udf(_k, "double")
    return k_udf(F.struct(*[F.col(c) for c in cols]))
