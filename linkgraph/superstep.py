"""The generic gather-scatter superstep loop.

This is the Spark rendition of Pregelix's per-superstep dataflow
(JobGenOuterJoin.java:236-407): messages from the previous superstep are
joined against the vertex state (outer join — every vertex visited, or
inner — only messaged/live vertices), the compute kernel produces the new
state and the next message relation, messages are combined
partially-then-finally across the shuffle (JobGen.java:1124-1215), and
the loop terminates on a driver-side convergence check (the reference's
TerminationStateWriter + readTerminationState, Driver.java:342-344).

Algorithms plug in a ``superstep_fn(state, k) -> StepResult`` built from
DataFrame ops only; the loop owns persistence, metrics, checkpointing,
resume, and convergence. Transient stat columns on the new state:

- ``_delta``  (double) — per-vertex change magnitude; the loop sums it.
- ``_changed`` (boolean) — per-vertex change flag; the loop counts it.

Both are stripped before the state is checkpointed.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .checkpoint import CheckpointManager
from .metrics import SuperstepMetrics, partition_histogram, skew_from_histogram


@contextmanager
def iteration_conf(spark, num_partitions: int | None = None):
    """Session conf for the scope of an iterative build+loop: AQE off,
    shuffle partitions pinned to the loop's partition count.

    Two AQE interactions break fixed co-partitioning in iteration:
    (1) a localCheckpoint'ed DataFrame planned under AQE reports
    UnknownPartitioning, so every superstep re-Exchanges the vertex
    state; (2) a DataFrame persisted under AQE caches an
    AdaptiveSparkPlan whose InMemoryTableScan likewise reports
    UnknownPartitioning, so the cached adjacency is re-shuffled every
    superstep. Both measured ~2x per-superstep cost at 20M vertices.
    AQE stays on outside the loop (scans, derivation, non-iterative
    analytics); in-loop skew is handled by explicit hub salting.

    Pinning ``spark.sql.shuffle.partitions`` to the loop's partition
    count keeps the in-loop ENSURE_REQUIREMENTS exchanges (the message
    combine) on the same partitioning as the cached adjacency and
    checkpointed state — and replaces AQE's small-shuffle coalescing
    with the explicit capacity-aware sizing from
    ``graph.choose_partitions`` (a 5k-vertex toy graph runs the loop on
    1 partition instead of 32 tiny tasks per superstep).

    NOTE: this mutates session-global SQL conf for the scope of the
    loop, so run ONE iterate() loop at a time per SparkSession. A
    concurrent job on another thread of the same session (e.g. a
    streaming query) would silently run under the loop's conf, and
    nested loops would restore the wrong values on exit. For concurrent
    iterative jobs, use separate SparkSessions
    (``spark.newSession()`` gives an isolated SQL conf over the same
    SparkContext).
    """
    before_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    before_sp = spark.conf.get("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if num_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", before_sp)


# Backwards-compatible alias (adjacency builds predating iteration_conf).
aqe_disabled = iteration_conf


@dataclass
class StepResult:
    state: DataFrame                   # new vertex state (may carry _delta/_changed/_msgs)
    messages: DataFrame | None = None  # combined message relation (for sampled skew)


# Message counts ride the state observation via the transient ``_msgs``
# column (per-vertex received count, summed by the loop like _delta /
# _changed) rather than a second Observation on the message frame: a
# CollectMetrics node in the middle of the superstep plan blocks the
# optimizer rewrite that keeps the checkpointed state's inherited
# sizeInBytes stats linear, so the stats grow MULTIPLICATIVELY per
# superstep (state appears twice per join tree) and Catalyst ends up
# doing BigInteger arithmetic on 2^k-bit numbers — measured: driver
# wedged ~superstep 17 on a 12-vertex graph. One observation per
# superstep, on the state only, is both the fast and the safe shape.


@dataclass
class LoopResult:
    state: DataFrame
    supersteps: int
    history: list[SuperstepMetrics]
    converged: bool


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the RDD blocks behind a ``localCheckpoint``'ed DataFrame.

    ``Dataset.unpersist()`` is a no-op for checkpoint RDDs — they are
    persisted at the RDD level (LogicalRDD over the materialized rows),
    not registered in the SQL CacheManager — so without this every
    superstep leaks one full vertex-state snapshot into executor
    storage memory until the driver happens to GC the Dataset reference
    and the ContextCleaner catches up. Measured effect of the leak:
    per-step time degrades ~2x across 12 supersteps at 10M vertices
    (storage eviction + GC churn), and small heaps eventually fail the
    superstep join with "Can't acquire ... bytes memory to build hash
    relation". The loop calls this on each superseded state snapshot.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        # defensive: reaches through py4j internals; worst case the
        # snapshot lingers until driver GC, as before
        pass


def local_checkpoint_fresh_stats(
    df: DataFrame,
    eager: bool = True,
    storage_level: StorageLevel | None = None,
) -> DataFrame:
    """``localCheckpoint`` that also RESETS Catalyst's size statistics.

    ``Dataset.localCheckpoint`` truncates the logical plan to a
    ``LogicalRDD`` but deliberately carries the ORIGIN plan's
    ``Statistics`` forward. For a loop frame that is re-JOINED with a
    frame derived from itself (pointer doubling, label contraction),
    that is catastrophic: the size-only estimator multiplies the two
    sides' ``sizeInBytes``, so the carried BigInteger doubles in BIT
    LENGTH every iteration, and by ~iteration 20 the driver spends
    whole seconds per plan inside ``BigInteger.multiply`` (measured:
    0.1s -> 32s per 10-row join over 24 self-join+checkpoint rounds;
    jstack shows ``multiplyToomCook3`` on megabit integers). Rebuilding
    the ``LogicalRDD`` WITHOUT ``originStats`` resets ``sizeInBytes``
    to the session default, which bounds the bit growth per plan to a
    constant regardless of loop depth. Partitioning/ordering metadata
    and the materialized RDD are copied verbatim, so co-partitioning
    contracts are unaffected. The stripped frame estimates as "large"
    (``spark.sql.defaultSizeInBytes``), which can only DISABLE an
    automatic broadcast — a safe direction at scale; loops that want a
    broadcast say so explicitly.

    Falls back to the plain checkpointed frame if the JVM internals
    ever move (the reconstruction reaches through py4j into
    ``LogicalRDD``'s constructor — package-private in Scala, public in
    bytecode).
    """
    if storage_level is not None:
        out = df.localCheckpoint(eager=eager, storageLevel=storage_level)
    else:
        out = df.localCheckpoint(eager=eager)
    try:
        spark = out.sparkSession
        jvm = spark._jvm
        lr = out._jdf.queryExecution().analyzed()
        if lr.getClass().getSimpleName() != "LogicalRDD":
            return out
        none = jvm.scala.Option.empty()
        args = [lr.productElement(i) for i in range(lr.productArity())]
        new_lr = jvm.org.apache.spark.sql.execution.LogicalRDD(
            *args, spark._jsparkSession, none, none
        )
        ds = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, new_lr
        )
        return DataFrame(ds, spark)
    except Exception:
        return out


def iterate(
    init_state: DataFrame,
    superstep_fn: Callable[[DataFrame, int], StepResult],
    converged: Callable[[SuperstepMetrics], bool],
    max_supersteps: int = 100,
    ckpt: CheckpointManager | None = None,
    resume: bool = True,
    track_messages: bool = True,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    num_partitions: int | None = None,
    global_aggs: dict[str, "F.Column"] | None = None,
    skew_sample_every: int = 8,
) -> LoopResult:
    """Run supersteps until ``converged(stats)`` or ``max_supersteps``.

    With a CheckpointManager, each committed superstep snapshot both
    truncates lineage and enables resume: if the checkpoint directory
    already holds committed supersteps (and ``resume``), iteration
    restarts from the latest snapshot instead of superstep 1.

    Message metrics: when the new state carries a transient ``_msgs``
    column (per-vertex received-message count), its sum rides the same
    materialization job as delta/changed — the default-config superstep
    runs exactly ONE SQL execution (one pass over the data; asserted in
    tests/test_superstep_jobs.py). The partition-skew histogram needs a
    grouped pass over the message frame, so it is *sampled*: computed
    only every ``skew_sample_every``-th superstep (0 disables). A
    superstep that returns ``messages`` without ``_msgs`` falls back to
    the legacy extra count job.
    """
    history: list[SuperstepMetrics] = []
    start_k = 1
    state = init_state
    spark = init_state.sparkSession

    # See iteration_conf: the loop must run with AQE off (and shuffle
    # partitions pinned to p) so the checkpointed state keeps its
    # hashpartitioning(id, p) and the only per-superstep shuffle is the
    # unavoidable message combine.
    with iteration_conf(spark, num_partitions):
        if ckpt is not None and resume:
            latest = ckpt.latest()
            if latest is not None:
                state, last = ckpt.load(latest)
                history = ckpt.history()
                if converged(last):
                    return LoopResult(state, latest, history, True)
                start_k = latest + 1

        state = state.persist(storage_level)
        done = False
        k = start_k - 1
        for k in range(start_k, max_supersteps + 1):
            t0 = time.monotonic()
            res = superstep_fn(state, k)
            # Convergence stats ride the materialization job as observed
            # metrics (no separate pass over the state) — the Spark
            # rendition of the reference's always-on global aggregators
            # computed inside the superstep dataflow
            # (FinalAggregateOperatorDescriptor, SURVEY.md §3.4).
            cols = set(res.state.columns)
            obs = Observation(f"superstep-{k}")
            agg_exprs = [F.count(F.lit(1)).alias("rows")]
            if "_delta" in cols:
                agg_exprs.append(F.sum("_delta").alias("delta"))
            if "_changed" in cols:
                agg_exprs.append(F.sum(F.col("_changed").cast("long")).alias("changed"))
            if "_msgs" in cols:
                agg_exprs.append(F.sum(F.col("_msgs").cast("long")).alias("messages"))
            # user global aggregates over the new vertex state — the
            # reference's per-superstep GlobalAggregator, computed inside
            # the same job (GlobalAggregator.java:42-78,
            # FinalAggregateOperatorDescriptor.java:47-139)
            if global_aggs:
                for name, expr in global_aggs.items():
                    agg_exprs.append(expr.alias(f"_ga_{name}"))
            # localCheckpoint (eager) both caches the new state AND
            # truncates its logical plan — without this, every
            # superstep's plan embeds all previous supersteps and the
            # driver OOMs after ~10 iterations. Durable fault tolerance
            # comes from the CheckpointManager below; this is the
            # in-memory lineage cut. (AQE must stay off here or the
            # checkpointed frame loses its partitioning — see above.)
            # transient stat columns are dropped BEFORE materialization —
            # the observe node sits below the projection so the metrics
            # still fire, and the cached state carries only real columns.
            # Stats are RESET as well: a superstep whose message frame
            # self-joins state-derived frames (Luby MIS, coloring)
            # multiplies the carried sizeInBytes each superstep, so its
            # bit length grows geometrically with loop depth — harmless
            # for tens of supersteps, unbounded BigInteger arithmetic in
            # every later plan at O(log n)-round scale. The estimate is
            # a useless overestimate after ~2 supersteps anyway (2^544
            # "bytes" measured at superstep 40), so nothing downstream
            # loses a broadcast it would actually have gotten.
            new_state = local_checkpoint_fresh_stats(
                res.state.observe(obs, *agg_exprs).drop(
                    "_delta", "_changed", "_msgs"
                )
            )

            stats = SuperstepMetrics(superstep=k)
            row = obs.get
            stats.rows = int(row["rows"])
            if "_delta" in cols:
                stats.delta = float(row["delta"] or 0.0)
            if "_changed" in cols:
                stats.changed = int(row["changed"] or 0)
            if global_aggs:
                stats.extras = {
                    name: row[f"_ga_{name}"] for name in global_aggs
                }

            if track_messages:
                sample_skew = (
                    skew_sample_every > 0
                    and res.messages is not None
                    and k % skew_sample_every == 0
                )
                if "_msgs" in cols:
                    # free: the count rode the materialization job above
                    stats.messages = int(row["messages"] or 0)
                    if sample_skew:
                        hist = partition_histogram(res.messages)
                        stats.skew_ratio = skew_from_histogram(hist)
                elif res.messages is not None:
                    # legacy path (superstep_fn without a _msgs column):
                    # one extra job for the count, skew still sampled
                    msgs = res.messages.persist(storage_level)
                    stats.messages = msgs.count()
                    if sample_skew:
                        hist = partition_histogram(msgs)
                        stats.skew_ratio = skew_from_histogram(hist)
                    msgs.unpersist()

            if ckpt is not None and ckpt.should_checkpoint(k):
                committed = ckpt.save(k, new_state, stats)
                # the committed parquet replaces the in-memory snapshot
                release_local_checkpoint(new_state)
                next_state = committed.persist(storage_level)
            else:
                next_state = new_state

            state.unpersist()
            release_local_checkpoint(state)
            state = next_state
            stats.wall_sec = time.monotonic() - t0
            history.append(stats)
            if converged(stats):
                done = True
                break

        return LoopResult(state, k, history, done)
