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


def triangle_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Incremental triangle maintenance: one row
    DF(gained BIGINT, lost BIGINT, delta BIGINT) — how the undirected
    triangle count changed between two edge snapshots, computed from
    work proportional to the CHURN, not the graph.

    A triangle appears in the diff iff it contains >= 1 changed pair,
    so enumeration starts FROM the changed pairs: for each added pair
    (u, v), its triangles in the new graph are u-v's common neighbors
    (one adjacency join per endpoint); triangles counted once via the
    canonical sorted triple even when 2-3 of their edges changed at
    once. Same for removed pairs over the old graph. At 100 TB this is
    |churn| * avg-degree work versus a full |E|^1.5 recount — the
    point of keeping the count maintained; the driver oracle verifies
    against an INDEPENDENT full enumeration of both snapshots.
    """

    def pairs(df):
        return (
            df.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
            )
            .distinct()
        )

    # each snapshot's pair relation feeds the anti-join, the wedge
    # expansion, and the closing semi-join — materialize once
    po, pn = pairs(old).persist(), pairs(new).persist()
    added = pn.join(po, ["u", "v"], "left_anti")
    removed = po.join(pn, ["u", "v"], "left_anti")

    def incident_triangles(changed, graph_pairs):
        """Distinct sorted triples {u, v, w} in ``graph_pairs`` where
        (u, v) is a changed pair and w closes it."""
        sym = graph_pairs.select(
            F.col("u").alias("a"), F.col("v").alias("b")
        ).unionByName(
            graph_pairs.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        wedge = changed.join(
            sym.select(F.col("a").alias("u"), F.col("b").alias("w")), "u"
        ).filter(F.col("w") != F.col("v"))
        closed = wedge.join(
            graph_pairs.select(
                F.least("u", "v").alias("_cu"), F.greatest("u", "v").alias("_cv")
            ).withColumnRenamed("_cu", "cu").withColumnRenamed("_cv", "cv"),
            (F.least("v", "w") == F.col("cu")) & (F.greatest("v", "w") == F.col("cv")),
            "left_semi",
        )
        return closed.select(
            F.array_sort(F.array("u", "v", "w")).alias("tri")
        ).distinct()

    gained = incident_triangles(added, pn).count()
    lost = incident_triangles(removed, po).count()
    po.unpersist()
    pn.unpersist()
    spark = old.sparkSession
    return spark.createDataFrame(
        [(gained, lost, gained - lost)],
        "gained long, lost long, delta long",
    )
