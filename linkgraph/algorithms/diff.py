"""Graph snapshot diff — the delta extractor behind incremental
analytics.

Warm restarts (PageRank ``init_ranks``, CC ``init_labels`` +
``initial_active``, streamed-edge resume) re-converge from a stale
answer in O(delta) supersteps — but they need the delta. This operator
computes it from two edge snapshots: which edges appeared/disappeared,
and which vertices' neighborhoods changed (the exact ``initial_active``
frontier for a warm restart).

Shape: two anti-joins for the edge diff plus one groupBy for the
per-vertex degree deltas — all equi-joins/aggregates on (src, dst), no
iteration, no Python. At 100 TB both snapshots stream once; the diff
output is O(churn), not O(graph), which is the entire point of
incremental maintenance (SURVEY.md §3.9's insert/delete mutation
channels are the reference's in-loop analogue; this is the
between-runs analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """DF(src, dst, op) — op 'add' for edges only in ``new``,
    'del' for edges only in ``old``. Snapshots are deduplicated
    first (edge multiplicity is not tracked)."""
    o = old.select("src", "dst").distinct()
    n = new.select("src", "dst").distinct()
    added = n.join(o, ["src", "dst"], "left_anti").withColumn("op", F.lit("add"))
    removed = o.join(n, ["src", "dst"], "left_anti").withColumn("op", F.lit("del"))
    return added.unionByName(removed)


def vertex_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """DF(id, d_out, d_in) — per-vertex out/in-degree change between
    the snapshots; only vertices with a nonzero change appear (the
    warm-restart activation frontier)."""
    d = edge_diff(old, new).withColumn(
        "sgn", F.when(F.col("op") == "add", F.lit(1)).otherwise(F.lit(-1))
    )
    outs = d.groupBy(F.col("src").alias("id")).agg(F.sum("sgn").alias("d_out"))
    ins = d.groupBy(F.col("dst").alias("id")).agg(F.sum("sgn").alias("d_in"))
    return (
        outs.join(ins, "id", "full_outer")
        .select(
            "id",
            F.coalesce("d_out", F.lit(0)).cast("long").alias("d_out"),
            F.coalesce("d_in", F.lit(0)).cast("long").alias("d_in"),
        )
        .filter((F.col("d_out") != 0) | (F.col("d_in") != 0))
    )
