"""PPR sweep cut — local community detection around a seed set.

The standard local-clustering recipe (Andersen-Chung-Lang 2006; the
spectral sweep of Spielman-Teng): rank vertices by personalized-
PageRank score normalized by degree, then scan prefixes of that
ranking and score each prefix S_k by its conductance

    phi(S_k) = cut(S_k) / min(vol(S_k), 2m - vol(S_k))

— the prefix minimizing phi is the seed's local community. ACL prove
a good sweep prefix exists whenever the seed sits in a low-conductance
set; the sweep itself is exact arithmetic over the ranking, so this
operator composes the already-gated PPR vertex program
(examples.personalized_pagerank, reference contract SURVEY.md §3.10)
with a window pass.

Distributed shape (the 100 TB design): the PPR loop is the audited
PageRank plan (one exchange per superstep). The sweep then touches
only the CANDIDATE set: with ``fixed_updates`` rounds, PPR mass is
nonzero only within that hop radius of the seeds, and the sweep keeps
the ``top_t`` candidates via TakeOrderedAndProject (per-partition
top-k, k*p driver merge — no global-sort shuffle, no one-partition
window over corpus-sized state). Prefix statistics need window sums
over the T ranked rows only; the one data-sized operation is the
edge->candidate rank join (two broadcast equi-joins of the T-row rank
map against the symmetrized edge list), reduced to a T-bucket
histogram of max-endpoint ranks before the window. cut(S_k) is
derived, not counted: vol(S_k) = 2*internal(S_k) + cut(S_k), so
cut = vol - 2*e_in and edges with an endpoint OUTSIDE the candidate
set never need per-prefix handling.

Determinism/oracle: the ranking key is (ROUND(ppr, 6) / deg) DESC,
id ASC — the rounded score is bit-identical across engines (the PPR
gate's own convention), the division is one IEEE op on identical
inputs, and the id tiebreak makes the total order unique, so the
whole sweep table is replayable in DuckDB by composing the unrolled
PPR oracle with the same window arithmetic. Conductance itself is
BIGINT cut / BIGINT min-volume in one final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..partitioning import symmetrize


def ppr_sweep_cut(
    edges: DataFrame,
    sources: list[int],
    fixed_updates: int = 6,
    damping: float = 0.85,
    top_t: int = 32,
    vertices: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sweep table over the PPR ranking around ``sources``.

    Returns DF(k, id, ppr, deg, volume, cut, conductance) — one row
    per prefix size k = 1..top_t in ranking order: vertex ``id`` is
    the k-th ranked vertex, ``volume``/``cut`` are the undirected
    volume and boundary of the first k vertices, ``conductance`` is
    phi(S_k) (NULL when the prefix swallows every edge — min volume
    0). The caller's local community is the argmin-conductance prefix.
    """
    from ..examples import personalized_pagerank

    # ACL operates on the UNDIRECTED graph: the walk, the degrees, and
    # the conductance all use the same symmetrized simple edge set
    sym = symmetrize(edges.select("src", "dst").distinct()).filter(
        F.col("src") != F.col("dst")
    )
    ranks, _ = personalized_pagerank(
        sym,
        sources,
        damping=damping,
        fixed_updates=fixed_updates,
        vertices=vertices,
        num_partitions=num_partitions,
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # candidates: positive rounded score AND nonzero undirected degree
    # (conductance needs volume); ranking key exact across engines
    cand = (
        ranks.select("id", F.round("rank", 6).alias("ppr"))
        .filter(F.col("ppr") > 0.0)
        .join(deg, "id")
        .withColumn("skey", F.col("ppr") / F.col("deg").cast("double"))
    )
    # top_t by (skey DESC, id ASC): orderBy+limit = TakeOrderedAndProject
    top = cand.orderBy(F.desc("skey"), F.asc("id")).limit(top_t)
    w_rank = Window.orderBy(F.desc("skey"), F.asc("id"))
    ranked = top.select(
        F.row_number().over(w_rank).cast("long").alias("k"), "id", "ppr", "deg"
    )
    # histogram of max-endpoint ranks over candidate-internal edges:
    # one row per undirected internal edge, reduced to <= top_t buckets
    ru = ranked.select(F.col("id").alias("src"), F.col("k").alias("ru"))
    rv = ranked.select(F.col("id").alias("dst"), F.col("k").alias("rv"))
    ein_hist = (
        sym.filter(F.col("src") < F.col("dst"))
        .join(F.broadcast(ru), "src")
        .join(F.broadcast(rv), "dst")
        .select(F.greatest("ru", "rv").alias("rmax"))
        .groupBy("rmax")
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    two_m = sym.agg(F.count(F.lit(1)).alias("two_m"))
    w_pre = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(ein_hist, ranked["k"] == ein_hist["rmax"], "left_outer")
        .select(
            "k",
            "id",
            "ppr",
            "deg",
            F.coalesce("ne", F.lit(0)).alias("ne"),
        )
        .withColumn("volume", F.sum("deg").over(w_pre))
        .withColumn("e_in", F.sum("ne").over(w_pre))
        .withColumn("cut", F.col("volume") - F.lit(2) * F.col("e_in"))
        .crossJoin(two_m)
    )
    return sweep.select(
        "k",
        "id",
        "ppr",
        "deg",
        "volume",
        "cut",
        F.when(
            F.least(F.col("volume"), F.col("two_m") - F.col("volume")) == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                F.col("cut").cast("double")
                / F.least(
                    F.col("volume"), F.col("two_m") - F.col("volume")
                ).cast("double"),
                6,
            )
        )
        .alias("conductance"),
    ).orderBy("k")
