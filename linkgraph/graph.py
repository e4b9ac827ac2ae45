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
