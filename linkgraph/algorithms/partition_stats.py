"""Partition-quality report — edge-cut and balance of a hash
partitioning, computed before committing to it.

The north rule makes partitioning/shuffle/skew first-class; this
operator makes a partitioning INSPECTABLE: given the vertex hash
function the engine will actually use (``repartition(p, "id")`` hashes
ids), report per-partition vertex/edge balance and the cut fraction —
the share of edges whose endpoints land in different partitions, i.e.
the share of every superstep's messages that must cross the exchange.
Use it to size ``num_partitions`` and to quantify what a better
placement (e.g. community-aligned ids from ``louvain_multilevel``,
then range partitioning) would save: renumbering vertices by community
drops the cut fraction, and this report is the before/after meter.

Shape: one projection assigning each endpoint its partition + one
groupBy per report — no joins, no iteration; cost is a single edge
scan. Hash families follow the house pattern (phash.py):
``portable=False`` (production) uses xxhash64 — NOT Spark's internal
``hash()`` so the assignment is engine-portable and stable across
Spark versions; ``portable=True`` derives the partition from md5
digits so the DuckDB oracle replays the identical assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..phash import md5_digits_spark_sql as _md5_digits_spark_sql
from ..phash import md5_int_sql as _md5_int_sql


def _part_arg(id_sql: str, seed: int) -> str:
    return f"concat_ws(':', 'pt', CAST({id_sql} AS STRING), '{seed}')"


def partition_coin_sql(id_sql: str, n_parts: int, seed: int) -> str:
    """Engine-neutral SQL (Spark AND DuckDB) for the partition of
    vertex ``id_sql`` — the oracle-side md5 digit-term spelling."""
    return f"({_md5_int_sql(_part_arg(id_sql, seed))} % {n_parts})"


def _spark_part(id_sql: str, n_parts: int, seed: int, portable: bool) -> str:
    if portable:
        return (
            f"({_md5_digits_spark_sql(f'md5({_part_arg(id_sql, seed)})', 6)}"
            f" % {n_parts})"
        )
    return f"pmod(xxhash64({_part_arg(id_sql, seed)}), {n_parts})"


def partition_quality(
    edges: DataFrame,
    n_parts: int,
    seed: int = 42,
    vertices: DataFrame | None = None,
    portable: bool = False,
    method: str = "hash",
) -> DataFrame:
    """Per-partition report DF(partition, n_vertices, n_out_edges,
    n_cut_edges) for the assignment part(v).

    ``method="hash"`` (default): part(v) = H(v) % n_parts — what
    ``repartition(p, "id")`` effectively does; locality-free by
    design. ``method="range"``: contiguous id blocks, part(v) =
    floor(v * n_parts / (max_id + 1)) — the placement that REWARDS a
    community-aligned renumbering (e.g. ids sorted by
    ``louvain_multilevel`` labels), which is how the before/after cut
    comparison is actually read.

    ``n_out_edges`` counts edges whose SOURCE lands in the partition
    (the partition's scatter work); ``n_cut_edges`` is the subset whose
    destination lands elsewhere (the partition's share of the
    exchange). Global cut fraction = sum(cut)/sum(out); balance =
    max(n_vertices)/mean — both one aggregate away.
    """
    if n_parts < 1:
        raise ValueError("n_parts must be >= 1")
    if method not in ("hash", "range"):
        raise ValueError("method must be 'hash' or 'range'")
    if method == "range":
        # the id span must cover explicitly-passed vertices too, else
        # every id above the edge max clamps into the last block and
        # skews the balance report
        hi = edges.select(
            F.greatest(F.max("src"), F.max("dst")).alias("m")
        ).collect()[0]["m"]
        if vertices is not None:
            vhi = vertices.select(F.max("id").alias("m")).collect()[0]["m"]
            if vhi is not None:
                hi = vhi if hi is None else max(int(hi), int(vhi))
        if hi is None:
            raise ValueError(
                "partition_quality(method='range') needs at least one "
                "edge or vertex to derive the id span"
            )
        span = int(hi) + 1

        def expr_for(col: str) -> str:
            # clamp: a vertex id beyond the edge range still lands in
            # the last block (non-negative ids assumed)
            return (
                f"CAST(LEAST({n_parts - 1},"
                f" {col} * {n_parts} DIV {span}) AS BIGINT)"
            )

        ps = F.expr(expr_for("src"))
        pd_ = F.expr(expr_for("dst"))
        vp = F.expr(expr_for("id"))
    else:
        ps = F.expr(_spark_part("src", n_parts, seed, portable))
        pd_ = F.expr(_spark_part("dst", n_parts, seed, portable))
        vp = F.expr(_spark_part("id", n_parts, seed, portable))
    per_edge = edges.select(
        ps.alias("partition"), (ps != pd_).cast("long").alias("cut")
    )
    eagg = per_edge.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n_out_edges"),
        F.sum("cut").alias("n_cut_edges"),
    )
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    vagg = (
        vertices.select(vp.alias("partition"))
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
    return (
        vagg.join(eagg, "partition", "full_outer")
        .select(
            "partition",
            F.coalesce("n_vertices", F.lit(0)).cast("long").alias("n_vertices"),
            F.coalesce("n_out_edges", F.lit(0)).cast("long").alias("n_out_edges"),
            F.coalesce("n_cut_edges", F.lit(0)).cast("long").alias("n_cut_edges"),
        )
    )


def renumber_by_label(
    labels: DataFrame, label_col: str = "component", id_col: str = "id"
) -> DataFrame:
    """(id, new_id) — dense contiguous new ids ordered by
    ``(label, id)``: the community-aligned renumbering that range
    placement rewards (see the module docstring's before/after read).

    After renumbering, each community occupies one contiguous id block,
    so ``partition_quality(method="range")`` on the renumbered edge
    relation reports the cut a range placement would actually pay —
    at 100 TB this is how you turn a community structure into real
    shuffle savings (intra-community messages stay partition-local).

    Dense numbering is assigned JVM-side by
    :func:`~linkgraph.partitioning.dense_index` (range repartition +
    per-partition row_number + O(p) driver offsets — no per-row Python,
    no single-partition window); the (label, id) order is total, so the
    mapping is deterministic and engine-reproducible (ROW_NUMBER in
    SQL).
    """
    from ..partitioning import dense_index

    base = labels.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("_lbl")
    )
    return dense_index(base, ["_lbl", "id"], "new_id").select(
        F.col("id").cast("long"), "new_id"
    )
