"""Whole-graph summary statistics — the one-row health report a crawl
operator reads before running anything iterative.

The reference's per-job global aggregators report vertex/edge counts
and per-algorithm totals (GlobalAggregator.java:42-78, SURVEY.md §3.4);
this operator widens that into the standard structural summary used to
sanity-check a freshly derived link graph: counts, density,
reciprocity (how bidirectional the linking is), degree extremes, and
degree assortativity (do hubs link to hubs?).

Shape: everything reduces to a handful of single-row aggregates over
the distinct edge relation and one degree join — each a partial/final
agg (map-side combine) or an equi-join on the vertex id, crossJoined at
the end into one row. No iteration, no driver-side loops; at 100 TB the
cost is a few scans + one shuffle per aggregate family.

All statistics are exact. Counts stay BIGINT; ratio statistics are
computed from exact integer sums cast to DOUBLE in a fixed expression
order and rounded to 6dp, so the DuckDB oracle reproduces them
bit-identically. NOTE: the assortativity moments multiply three
integer sums; at >10^10 edges compute them as DOUBLE from the start
(the 6dp answer is unaffected; int64 products are not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import symmetrize


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Degree-mixing profile knn(k): for each undirected degree class
    k, the average degree of the neighbors of degree-k vertices
    (Pastor-Satorras et al.) — the standard curve for "do hubs attach
    to hubs or to leaves", read next to the scalar assortativity in
    :func:`graph_summary`.

    Shape: one degree aggregate, one self-join of the symmetrized edge
    list against it (vertex-keyed equi-joins), one final groupBy per
    degree class — all partial/final aggregates, no iteration. The
    ratio is SUM(BIGINT)/COUNT(BIGINT) in one IEEE division, so the
    oracle matches bit for bit.

    Returns DF(degree BIGINT, n_vertices BIGINT, avg_neighbor_degree
    DOUBLE) sorted by degree.
    """
    sym = symmetrize(edges.select("src", "dst").distinct())
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    per_vertex = (
        sym.alias("s")
        .join(deg.alias("dx"), F.col("s.src") == F.col("dx.src"))
        .join(deg.alias("dy"), F.col("s.dst") == F.col("dy.src"))
        .groupBy(F.col("dx.deg").alias("degree"))
        .agg(
            F.count_distinct(F.col("s.src")).alias("n_vertices"),
            F.sum(F.col("dy.deg")).alias("snd"),
            F.count(F.lit(1)).alias("m"),
        )
    )
    return per_vertex.select(
        "degree",
        "n_vertices",
        (F.col("snd").cast("double") / F.col("m").cast("double")).alias(
            "avg_neighbor_degree"
        ),
    ).orderBy("degree")


def rich_club_profile(edges: DataFrame, max_k: int | None = None) -> DataFrame:
    """Rich-club coefficient phi(k) = E_k / (N_k * (N_k - 1) / 2):
    among the N_k vertices of undirected degree > k, what fraction of
    possible edges exist (Zhou-Mondragon) — the web-graph test for a
    densely interlinked hub elite.

    Computed for every k at once with no per-k scans: sort the degree
    sequence once, then E_k and N_k are suffix aggregates. A vertex of
    degree d is in club k for all k < d, and an edge (u, v) survives
    while k < min(deg_u, deg_v), so per-k counts come from one groupBy
    per relation + a running window over at most max(deg) rows — the
    whole profile is two shuffles regardless of graph size.

    All counts are BIGINT; phi is one IEEE division. Returns
    DF(k BIGINT, n_club BIGINT, e_club BIGINT, phi DOUBLE) for k =
    0..max_k (default: largest k with at least 2 club members).
    """
    from pyspark.sql import Window

    sym = symmetrize(edges.select("src", "dst").distinct())
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    und = (
        sym.filter(F.col("src") < F.col("dst"))
        .alias("e")
        .join(deg.alias("du"), F.col("e.src") == F.col("du.src"))
        .join(deg.alias("dv"), F.col("e.dst") == F.col("dv.src"))
        .select(F.least("du.deg", "dv.deg").alias("mind"))
    )
    # vertices with degree > k: suffix count of the degree histogram
    dh = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nv"))
    eh = und.groupBy("mind").agg(F.count(F.lit(1)).alias("ne"))
    w = Window.orderBy(F.desc("k")).rowsBetween(Window.unboundedPreceding, 0)
    ks = (
        dh.agg(F.max("deg").alias("mx"))
        .selectExpr("explode(sequence(0, mx - 1)) AS k")
    )
    prof = (
        ks.join(dh, F.col("k") == F.col("deg") - 1, "left_outer")
        .select("k", F.coalesce("nv", F.lit(0)).alias("nv_at"))
        .join(eh, F.col("k") == F.col("mind") - 1, "left_outer")
        .withColumn("ne_at", F.coalesce("ne", F.lit(0)))
        .select("k", "nv_at", "ne_at")
        .withColumn("n_club", F.sum("nv_at").over(w))
        .withColumn("e_club", F.sum("ne_at").over(w))
        .filter(F.col("n_club") >= 2)
        .select(
            "k",
            "n_club",
            "e_club",
            (
                F.lit(2.0)
                * F.col("e_club").cast("double")
                / (
                    F.col("n_club").cast("double")
                    * (F.col("n_club").cast("double") - F.lit(1.0))
                )
            ).alias("phi"),
        )
    )
    if max_k is not None:
        prof = prof.filter(F.col("k") <= max_k)
    return prof.orderBy("k")


def graph_summary(edges: DataFrame) -> DataFrame:
    """One row: (n_vertices, n_edges, n_undirected, reciprocity,
    max_out_degree, avg_out_degree, density, assortativity).

    - reciprocity: fraction of distinct directed edges whose reverse
      edge also exists.
    - density: undirected edge count over n*(n-1)/2.
    - assortativity: Pearson correlation of endpoint undirected degrees
      over the symmetrized edge list (Newman 2002); NULL when degrees
      are constant (zero variance).
    """
    e = edges.select("src", "dst").distinct()
    sym = symmetrize(e)

    nv = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .agg(F.count_distinct("id").alias("n_vertices"))
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    und = sym.agg((F.count(F.lit(1)) / 2).cast("long").alias("n_undirected"))
    recip = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_recip"))
    )
    odeg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.max("d").alias("max_out_degree"),
            F.sum("d").alias("sum_out"),
            F.count(F.lit(1)).alias("n_src"),
        )
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    mom = (
        sym.alias("s")
        .join(deg.alias("dx"), F.col("s.src") == F.col("dx.src"))
        .join(deg.alias("dy"), F.col("s.dst") == F.col("dy.src"))
        .select(F.col("dx.deg").alias("x"), F.col("dy.deg").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    d = F.lit(1.0)  # spelled-out double casts keep both engines identical
    return (
        nv.crossJoin(ne)
        .crossJoin(und)
        .crossJoin(recip)
        .crossJoin(odeg)
        .crossJoin(mom)
        .select(
            "n_vertices",
            "n_edges",
            "n_undirected",
            F.round(
                F.col("n_recip").cast("double") / F.col("n_edges").cast("double"), 6
            ).alias("reciprocity"),
            "max_out_degree",
            F.round(
                F.col("sum_out").cast("double") / F.col("n_vertices").cast("double"),
                6,
            ).alias("avg_out_degree"),
            F.round(
                (d * 2.0 * F.col("n_undirected").cast("double"))
                / (
                    F.col("n_vertices").cast("double")
                    * (F.col("n_vertices").cast("double") - 1.0)
                ),
                6,
            ).alias("density"),
            # symmetric listing: y-moments equal x-moments, so Pearson
            # reduces to (m*sxy - sx^2) / (m*sxx - sx^2); NULL on zero
            # variance (regular graphs)
            F.round(
                F.when(
                    F.col("m").cast("double") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                    == 0.0,
                    F.lit(None).cast("double"),
                ).otherwise(
                    (
                        F.col("m").cast("double") * F.col("sxy").cast("double")
                        - F.col("sx").cast("double") * F.col("sx").cast("double")
                    )
                    / (
                        F.col("m").cast("double") * F.col("sxx").cast("double")
                        - F.col("sx").cast("double") * F.col("sx").cast("double")
                    )
                ),
                6,
            ).alias("assortativity"),
        )
    )


def community_conductance(
    edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Per-community conductance phi(c) = cut(c) / min(vol(c), 2m -
    vol(c)) over the undirected simple graph — the per-community
    companion to the scalar :func:`modularity`: a community with high
    phi leaks most of its edge ends to the outside (badly separated),
    phi near 0 is a well-cut module. Standard quality report for
    LPA/Louvain output.

    Exact arithmetic: cut and volume are BIGINT counts over the
    symmetrized edge relation (each crossing edge contributes exactly
    one end to its community's cut), so the only float op is the one
    final division, rounded to 6dp — bit-identical across engines.

    Shape: one degree aggregate, two id-keyed label joins, two
    label-keyed partial/final aggregates — no iteration, nothing
    collected; at 100 TB this is a handful of keyed exchanges.

    Returns DF(community, n_members, volume, cut, conductance) — one
    row per label; communities with min(vol, 2m - vol) = 0 (isolated
    members only, or the whole graph) report NULL conductance.
    """
    sym = symmetrize(edges.select("src", "dst").distinct()).filter(
        F.col("src") != F.col("dst")
    )
    lab = labels.select("id", F.col(label_col).alias("_lbl"))
    two_m = sym.agg(F.count(F.lit(1)).alias("two_m"))
    ends = (
        sym.join(lab.selectExpr("id AS src", "_lbl AS lu"), "src")
        .join(lab.selectExpr("id AS dst", "_lbl AS lv"), "dst")
        .groupBy(F.col("lu").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("volume"),
            F.sum((F.col("lu") != F.col("lv")).cast("long")).alias("cut"),
        )
    )
    members = lab.groupBy(F.col("_lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        members.join(ends, "community", "left_outer")
        .select(
            "community",
            "n_members",
            F.coalesce("volume", F.lit(0)).alias("volume"),
            F.coalesce("cut", F.lit(0)).alias("cut"),
        )
        .crossJoin(two_m)
        .select(
            "community",
            "n_members",
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
        )
    )


def modularity(
    edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Newman modularity Q of a community assignment (labels:
    DF(id, label)) over the undirected simple graph:

        Q = E_in / m  -  sum_c d_c^2 / (4 m^2)

    with m = undirected edge count, E_in = within-community edges, d_c
    = total degree of community c — the standard quality score for LPA
    output, rewritten so every aggregate is an exact BIGINT sum and Q
    is one fixed float expression (bit-identical across engines; no
    per-community float summation order to disagree on).

    Shape: one degree aggregate, two label equi-joins on the edge
    relation, one per-community aggregate — all partial/final
    combines. NOTE: d_c^2 overflows int64 when a community's total
    degree exceeds ~3e9; at that scale compute the moments as DOUBLE
    (the 6dp answer is unaffected).

    Returns one row: (n_communities, m_edges, within_edges,
    sum_deg_sq, modularity).
    """
    sym = symmetrize(edges.select("src", "dst").distinct()).filter(
        F.col("src") != F.col("dst")
    )
    lab = labels.select(F.col("id"), F.col(label_col).alias("_lbl"))
    und = (
        sym.filter(F.col("src") < F.col("dst"))
        .join(lab.selectExpr("id AS src", "_lbl AS lu"), "src")
        .join(lab.selectExpr("id AS dst", "_lbl AS lv"), "dst")
    )
    ecounts = und.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.sum((F.col("lu") == F.col("lv")).cast("long")).alias("within_edges"),
    )
    dmom = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .join(lab.selectExpr("id AS src", "_lbl"), "src")
        .groupBy("_lbl")
        .agg(F.sum("deg").alias("dc"))
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum(F.col("dc") * F.col("dc")).alias("sum_deg_sq"),
        )
    )
    return ecounts.crossJoin(dmom).select(
        "n_communities",
        "m_edges",
        "within_edges",
        "sum_deg_sq",
        (
            F.col("within_edges").cast("double") / F.col("m_edges").cast("double")
            - F.col("sum_deg_sq").cast("double")
            / (
                F.lit(4.0)
                * F.col("m_edges").cast("double")
                * F.col("m_edges").cast("double")
            )
        ).alias("modularity"),
    )
