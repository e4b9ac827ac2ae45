"""Embedding quality evaluation — link-prediction AUC.

The standard intrinsic check of a graph embedding (node2vec §4.3,
DeepWalk follow-ups): do actual edges score higher than non-edges
under the embedding dot product? AUC is the probability a uniformly
random positive (edge) outranks a uniformly random negative
(non-edge), computed here EXACTLY via the Mann-Whitney rank-sum —
no sampling of comparison pairs, no Monte Carlo:

    AUC = (sum of positives' average ranks − P(P+1)/2) / (P·N)

Average ranks handle score ties exactly (every tie contributes 1/2),
so the statistic is a pure rational function of the integer dot
products: the engine reports the integer numerator ``u2`` (= 2·U)
alongside the one-IEEE-division ``auc``, which is what lets the DuckDB
oracle hash-match the result bit for bit when fed the same bit-exact
integer embeddings (pipeline/sgns.py).

Negatives are drawn by a deterministic arithmetic rule (one candidate
per vertex, anti-joined against the true edge set) — reproducible in
SQL, no RNG state. At corpus scale the eval runs on exactly this kind
of bounded negative sample; P+N stays O(V+E).

Distributed shape: dot products are one join per endpoint against the
(vertex, dim, value) embedding relation + a pair groupBy (exact BIGINT:
|value| <= 2^15+1 and dim is small, so each product term < 2^31).
The rank-sum never ranks raw rows (an unpartitioned window is a
single-task sort in Spark): pairs aggregate to the score HISTOGRAM
first, and the cumulative negative count runs over that aggregated
frame — the one remaining ordered pass touches distinct scores only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

NEG_A = 37
NEG_B = 11


def negative_pairs(edges: DataFrame, vertices: DataFrame, n_vertices: int) -> DataFrame:
    """One deterministic non-edge candidate per vertex: the canonical
    pair of (v, (v*NEG_A + NEG_B) mod n), self-pairs dropped, true
    edges (either orientation) anti-joined away."""
    canon_e = edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    cand = (
        vertices.select(F.col("id").alias("a"))
        .withColumn("b", (F.col("a") * NEG_A + NEG_B) % n_vertices)
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    return cand.join(canon_e, ["u", "v"], "left_anti")


def linkpred_auc(
    embeddings: DataFrame,
    edges: DataFrame,
    vertices: DataFrame,
    n_vertices: int,
    side: str = "in",
) -> DataFrame:
    """Returns a ONE-row DF(n_pos BIGINT, n_neg BIGINT, u2 BIGINT,
    auc DOUBLE): exact Mann-Whitney AUC of the embedding dot product
    separating true (canonical, deduplicated) edges from the
    deterministic negative sample. ``embeddings`` is the
    (vertex, side, dim, value) relation of pipeline/sgns.train_sgns;
    ``u2`` = 2·(rank-sum U), so auc = u2 / (2·n_pos·n_neg)."""
    emb = embeddings.filter(F.col("side") == side).select("vertex", "dim", "value")

    pos = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .withColumn("label", F.lit(1))
    )
    neg = negative_pairs(edges, vertices, n_vertices).withColumn("label", F.lit(0))
    pairs = pos.unionByName(neg)

    eu = emb.select(F.col("vertex").alias("u"), "dim", F.col("value").alias("vu"))
    ev = emb.select(F.col("vertex").alias("v"), "dim", F.col("value").alias("vv"))
    scored = (
        pairs.join(eu, "u")
        .join(ev, ["v", "dim"])
        .groupBy("u", "v", "label")
        .agg(F.sum(F.col("vu") * F.col("vv")).alias("score"))
    )

    # Rank-sum WITHOUT ranking raw rows: a global window over the raw
    # scored pairs would shuffle P+N rows into ONE partition (Spark
    # windows with no partitionBy are single-task). Instead aggregate
    # to the score HISTOGRAM first — (score, n, n_pos) — and take the
    # running sum over that far smaller frame; U then needs only
    # "negatives strictly below" plus half the same-score negatives:
    #   2U = sum over scores s of n_pos(s) * (2*cum_neg_below(s) + n_neg(s))
    # which equals the tie-averaged Mann-Whitney numerator exactly.
    hist = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    w_cum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = hist.select(
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        F.coalesce(
            F.sum(F.col("n") - F.col("n_pos")).over(w_cum), F.lit(0)
        ).alias("cum_neg_below"),
    )
    return ranked.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("n_pos") * (2 * F.col("cum_neg_below") + F.col("n_neg"))
        )
        .cast("long")
        .alias("u2"),
    ).select(
        "n_pos",
        "n_neg",
        "u2",
        (
            F.col("u2").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )
