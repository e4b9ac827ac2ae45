"""Incremental analytics compositions: snapshot diff → warm restart.

The pieces exist separately — :mod:`diff` extracts the churn,
:func:`~linkgraph.algorithms.cc.connected_components` accepts warm
seeds, :func:`~linkgraph.algorithms.diff.triangle_delta` maintains the
triangle count — and this module composes them into the one-call
"a new snapshot arrived" update a growing corpus actually runs
(VERDICT r3 item #6; the reference's in-loop analogue is SURVEY.md
§3.9's insert/delete mutation channels).

Correctness around deletions: min-label CC labels only ever DECREASE
during propagation, so a stale label is a valid warm seed only while
it still names a same-component vertex. Edge ADDITIONS preserve that
(components only merge); a DELETION can split a component and leave
labels naming now-unreachable vertices. :func:`incremental_cc`
therefore resets every vertex of each deletion-touched OLD component
to its own id (and activates it) while untouched components keep their
labels with only the added-edge endpoints active — work is
O(churn + deletion-affected components + merge regions), not O(graph),
and the answer is exactly the cold recompute's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import connected_components
from .diff import edge_diff, triangle_delta


def incremental_cc(
    new_edges: DataFrame,
    old_edges: DataFrame,
    old_labels: DataFrame,
    vertices: DataFrame | None = None,
    **cc_kwargs,
):
    """Connected components of ``new_edges`` warm-started from the
    previous snapshot's labels.

    ``old_labels`` is the (id, component) answer for ``old_edges``
    (cold or itself incremental). Returns ``(DF(id, component),
    LoopResult)`` — identical labels to a cold run on ``new_edges``,
    reached in O(changed region) supersteps.
    """
    d = edge_diff(old_edges, new_edges)
    added = d.filter(F.col("op") == "add")
    deleted = d.filter(F.col("op") == "del")

    def endpoints(df):
        return (
            df.select(F.col("src").alias("id"))
            .unionByName(df.select(F.col("dst").alias("id")))
            .distinct()
        )

    # old components touched by any deletion: reset to own id (a split
    # component's stale min may be unreachable now), everything else
    # keeps its label
    del_comps = (
        old_labels.join(endpoints(deleted), "id", "left_semi")
        .select("component")
        .distinct()
    )
    reset = old_labels.join(del_comps, "component", "left_semi").select(
        "id", F.lit(True).alias("_reset")
    )
    init = (
        old_labels.join(reset, "id", "left_outer")
        .select(
            "id",
            F.when(F.col("_reset"), F.col("id"))
            .otherwise(F.col("component"))
            .alias("component"),
        )
    )
    active = endpoints(added).unionByName(reset.select("id")).distinct()
    return connected_components(
        new_edges,
        vertices=vertices,
        init_labels=init,
        initial_active=active,
        **cc_kwargs,
    )


def incremental_triangle_count(
    new_edges: DataFrame,
    old_edges: DataFrame,
    old_total: int,
) -> DataFrame:
    """One row DF(total BIGINT): the new snapshot's undirected triangle
    count maintained from the old total + churn-proportional delta
    enumeration (:func:`~linkgraph.algorithms.diff.triangle_delta`)."""
    delta = triangle_delta(old_edges, new_edges)
    return delta.select(
        (F.lit(int(old_total)) + F.col("delta")).cast("long").alias("total")
    )
