"""SparkSession factory for the link-graph engine.

Defaults are chosen for the iterative gather-scatter workload
(SURVEY.md SS6): AQE on (runtime shuffle-partition coalescing + skew-join
splitting stands in for the reference's DynamicOptimizer,
/root/reference pregelix-core DynamicOptimizer.java:48-120), Arrow on
(all Python-side kernels are vectorized pandas UDFs, never per-row
Python), and an explicit shuffle-partition count sized to the cluster.

At real cluster scale, pass ``shuffle_partitions ~= 2-3x total cores``
and let AQE coalesce down; on 100 TB inputs also raise
``spark.sql.files.maxPartitionBytes`` knobs via ``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "linkgraph",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for iterative graph jobs.

    ``master=None`` defers to spark-submit / an existing session, so the
    same code path works under ``spark-submit --py-files`` on a real
    multi-executor cluster (BASELINE.json north_rule) and under
    ``local[k]`` in tests and benchmarks.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("LINKGRAPH_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    conf = {
        # Runtime re-planning: coalesce small shuffles, split skewed ones.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # All Python UDF traffic is Arrow-batched (pandas UDFs only).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Gather-scatter joins are large-vs-large equi-joins on the
        # vertex id with no exploitable ordering: shuffled-hash beats
        # sort-merge (no per-superstep sort of the vertex state).
        # Partition sizing keeps build sides bounded (~rows/partitions).
        "spark.sql.join.preferSortMergeJoin": "false",
        # Iterative loops re-reference the same cached adjacency; don't
        # let broadcast timeouts kill long supersteps.
        "spark.sql.broadcastTimeout": "1200",
        # Keep plans from growing unboundedly across supersteps.
        "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
        # Serialized cached blocks (per-superstep localCheckpoint state,
        # retained walk corpus frames) are NOT compressed by default,
        # unlike shuffle — LZ4 them: vertex-state rows are narrow
        # integer tuples that compress several-fold, and the retained
        # DISK_ONLY walk frames turn from disk-bandwidth-bound writes
        # into cheap compressed streams. Deserialized MEMORY_ONLY
        # caches are unaffected.
        "spark.rdd.compress": "true",
        # A convergence run is hundreds of supersteps = hundreds of SQL
        # executions; the status store retains plan-description strings
        # per execution (default 1000) which accumulate to real driver
        # heap on deep iterative plans. Keep a bounded window.
        "spark.sql.ui.retainedExecutions": "100",
        "spark.ui.enabled": "false",
        "spark.driver.host": "127.0.0.1",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
