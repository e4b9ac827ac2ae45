"""Shared graph helpers used by every algorithm."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """All vertex ids appearing as src or dst -> DF(id). The reference's
    vertex relation also materializes message-only targets
    (webmapcomplex's dangling refs, FIXTURES.md SS2.2)."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def default_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


# Per-superstep shuffle traffic is proportional to the edge count, so
# in-loop parallelism is sized from it: enough partitions to keep each
# under ~TARGET edges (bounded task state), capped by the session's
# shuffle-partition setting (the cluster-size knob). AQE would coalesce
# toy-scale shuffles the same way at runtime, but it must stay off
# inside the loop (superstep.iteration_conf), so the sizing is explicit.
TARGET_EDGES_PER_PARTITION = 250_000


def choose_partitions(df, n_rows, explicit: int | None = None) -> int:
    """Pick the loop partition count. ``n_rows`` may be an int or a
    zero-arg callable (e.g. ``lambda: edges.count()``) so the count job
    is skipped entirely when ``explicit`` is supplied."""
    if explicit is not None:
        return max(1, explicit)
    if callable(n_rows):
        n_rows = n_rows()
    cap = default_partitions(df)
    return max(1, min(cap, -(-n_rows // TARGET_EDGES_PER_PARTITION)))
