"""SGNS (skip-gram with negative sampling) embedding training in
EXACT integer arithmetic — the graph-embedding trainer that closes the
walks → skip-gram pairs → vertex embeddings pipeline.

Distributed embedding training is normally unverifiable across engines:
float gradient sums depend on reduction order, and sigmoid/exp differ
by ULPs between runtimes. This trainer removes both sources of drift:

- **Scaled-integer embeddings.** Every embedding coordinate is a
  BIGINT in units of ``1/S`` (``S = 2**scale_bits``); dot products,
  gradients, and updates are integer expressions, so sums are
  associative and order-free — the same trick as the engine's
  micro-unit centralities (betweenness.py, harmonic).
- **Hard sigmoid.** ``σ(z) ≈ clamp(1/2 + z/4, 0, 1)`` (Collobert's
  hard version) instead of the logistic — pure clamp/shift/divide, so
  both the numpy kernel and a SQL oracle compute the identical value;
  the only division is a floor-div whose operands are bounded (< 2^50)
  so even a DOUBLE-based ``FLOOR(a/b)`` spelling is exact.
- **Counter-based init and negatives.** Initial coordinates and the
  negative samples are pure functions of (vertex, dim, seed) /
  (center, context, m, seed) via the phash coin convention —
  ``portable=True`` draws md5 coins an external SQL engine reproduces,
  the default draws xxhash64.

Training is full-batch gradient descent per epoch (every gradient
reads the epoch-start model), run on the IMRU loop: the integer model
broadcasts, each Arrow batch of examples produces an int64 gradient
partial, partials tree-reduce by exact addition, the driver applies
the update. Partial size is O(V·d) — like the reference's IMRU kmeans
this targets the ROLLED-UP granularity of the north-star data model
(repo vertices, 1e5-1e7 rows), not the raw file graph; at that size
the model broadcast is a few hundred MB, the standard regime for
broadcast-style embedding training.

Loss being optimized (per example, weight n): hard-sigmoid SGNS —
positives push σ(in_c·out_x) toward 1, negatives toward 0; gradient
g = σ − y applied to both sides with learning rate lr_num/lr_den.
Embeddings clamp to ±2 (±2S in integer units) each update, bounding
every intermediate for exactness.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..phash import md5_digits_spark_sql


@dataclass
class SGNSModel:
    vocab: np.ndarray  # sorted vertex ids, index == embedding row
    emb_in: np.ndarray  # int64 [V, d], units of 1/S
    emb_out: np.ndarray  # int64 [V, d]
    scale: int
    epochs_run: int


def _coin_expr(tag: str, parts: list[str], seed: int, portable: bool) -> str:
    arg = f"concat_ws(':', '{tag}', {', '.join(f'CAST({p} AS STRING)' for p in parts)}, '{seed}')"
    if portable:
        return md5_digits_spark_sql(f"md5({arg})", 6)
    return f"pmod(xxhash64({arg}), {2 ** 62})"


def coin_sql_oracle(tag: str, parts: list[str], seed: int) -> str:
    """The portable coin's engine-neutral (DuckDB-valid) spelling —
    must stay value-identical to ``_coin_expr(portable=True)``."""
    from ..phash import md5_int_sql

    arg = f"concat_ws(':', '{tag}', {', '.join(f'CAST({p} AS STRING)' for p in parts)}, '{seed}')"
    return md5_int_sql(arg)


def train_sgns(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    dim: int = 8,
    epochs: int = 3,
    negatives: int = 2,
    lr_num: int = 1,
    lr_den: int = 4,
    seed: int = 11,
    scale_bits: int = 14,
    portable: bool = False,
    max_pair_weight: int = 1 << 15,
    max_driver_vocab: int = 1_000_000,
) -> tuple[DataFrame, SGNSModel]:
    """Train integer SGNS embeddings on ``pairs`` (center BIGINT,
    context BIGINT, n_pairs BIGINT — the :func:`~linkgraph.algorithms.
    walks.skipgram_pairs` contract).

    Returns ``(DF(vertex, side, dim, value), model)`` where ``side``
    is 'in'/'out' and ``value`` is the BIGINT coordinate in units of
    ``1/2**scale_bits`` — bit-identical for any partitioning, core
    count, or (in portable mode) SQL engine replaying the spec.

    ``vertices`` fixes the vocabulary (one embedding row per id);
    default = distinct center ∪ context. Negative m for an observed
    (center, context) pair is ``vocab[coin('sgn', c, x, m) % V]`` —
    fixed across epochs, weight n like its positive.
    """
    if dim < 1 or dim > 64:
        raise ValueError("dim must be in [1, 64] (integer-exactness bound)")
    if epochs < 1 or negatives < 0 or lr_num < 1 or lr_den < 1:
        raise ValueError("epochs >= 1, negatives >= 0, lr_num/lr_den >= 1")
    if not 8 <= scale_bits <= 16:
        raise ValueError("scale_bits in [8, 16] keeps every term < 2^50")
    S = 1 << scale_bits
    spark = pairs.sparkSession

    if vertices is None:
        vertices = (
            pairs.select(F.col("center").alias("id"))
            .union(pairs.select(F.col("context").alias("id")))
            .distinct()
        )
    # loud scale guard (VERDICT r3): this IMRU variant materializes two
    # V x dim int64 matrices ON THE DRIVER and broadcasts them per
    # epoch — faithful to the reference's model-broadcast shape but
    # driver-RAM-bounded.  Past the cap, use train_sgns_sharded, which
    # keeps the model sharded as a DataFrame and is bit-identical.
    n_vocab = vertices.select("id").distinct().count()
    if n_vocab > max_driver_vocab:
        raise ValueError(
            f"vocabulary of {n_vocab} rows exceeds max_driver_vocab="
            f"{max_driver_vocab} for the driver-held IMRU trainer; use "
            "train_sgns_sharded (bit-identical output, model stays "
            "distributed) or raise the cap explicitly"
        )
    vocab = np.array(
        sorted(r["id"] for r in vertices.select("id").distinct().collect()),
        dtype=np.int64,
    )
    V = len(vocab)
    if V == 0:
        raise ValueError("empty vocabulary")

    # --- deterministic init: coordinate (v, j) = coin % S - S/2 -----
    grid = (
        spark.createDataFrame(
            [(int(v),) for v in vocab], "vertex LONG"
        )
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))))
    )
    init = grid.selectExpr(
        "vertex",
        "j",
        f"{_coin_expr('sgi', ['vertex', 'j'], seed, portable)} % {S} - {S // 2} AS vi",
        f"{_coin_expr('sgo', ['vertex', 'j'], seed, portable)} % {S} - {S // 2} AS vo",
    ).collect()
    idx_of = {int(v): i for i, v in enumerate(vocab)}
    emb_in = np.zeros((V, dim), dtype=np.int64)
    emb_out = np.zeros((V, dim), dtype=np.int64)
    for r in init:
        i = idx_of[r["vertex"]]
        emb_in[i, r["j"]] = r["vi"]
        emb_out[i, r["j"]] = r["vo"]

    # --- examples: positives + counter-drawn negatives, JVM-side ----
    pos = pairs.selectExpr(
        "center AS c", "context AS x", "CAST(1 AS INT) AS y",
        "CAST(n_pairs AS BIGINT) AS n", "CAST(-1 AS INT) AS m",
    )
    if negatives > 0:
        vocab_df = F.broadcast(
            spark.createDataFrame(
                [(i, int(v)) for i, v in enumerate(vocab)], "idx LONG, v LONG"
            )
        )
        neg = (
            pairs.withColumn(
                "m", F.explode(F.sequence(F.lit(0), F.lit(negatives - 1)))
            )
            .selectExpr(
                "center AS c",
                "CAST(n_pairs AS BIGINT) AS n",
                "m",
                f"{_coin_expr('sgn', ['center', 'context', 'm'], seed, portable)}"
                f" % {V} AS idx",
            )
            .join(vocab_df, "idx")
            .selectExpr("c", "v AS x", "CAST(0 AS INT) AS y", "n", "m")
        )
        examples = pos.unionByName(neg)
    else:
        examples = pos

    # map vertex ids -> dense rows for the numpy gather
    iv = F.broadcast(
        spark.createDataFrame(
            [(int(v), i) for i, v in enumerate(vocab)], "v LONG, i LONG"
        )
    )
    ex = (
        examples.join(iv.selectExpr("v AS c", "i AS ci"), "c")
        .join(iv.selectExpr("v AS x", "i AS xi"), "x")
        .select("ci", "xi", "y", "n")
    )

    from ..imru import imru_run

    half, quarter_den, upd_den = S // 2, 4 * S, lr_den * S
    clamp = 2 * S

    def map_fn(pdf: pd.DataFrame, model):
        mi, mo = model
        ci = pdf["ci"].to_numpy(np.int64)
        xi = pdf["xi"].to_numpy(np.int64)
        y = pdf["y"].to_numpy(np.int64)
        n = np.minimum(pdf["n"].to_numpy(np.int64), max_pair_weight)
        a, b = mi[ci], mo[xi]  # [B, d] int64, |coord| <= 2S
        s = (a * b).sum(axis=1)  # |s| <= d * 4S^2 < 2^38
        sigma = np.clip(half + np.floor_divide(s, quarter_den), 0, S)
        g = sigma - y * S  # |g| <= S
        w = -(lr_num * n * g)  # |w| <= lr_num * n * S
        gi = np.zeros_like(mi)
        go = np.zeros_like(mo)
        np.add.at(gi, ci, np.floor_divide(w[:, None] * b, upd_den))
        np.add.at(go, xi, np.floor_divide(w[:, None] * a, upd_den))
        return gi, go

    def reduce_fn(p, q):
        return p[0] + q[0], p[1] + q[1]

    def update_fn(model, red):
        mi, mo = model
        return (
            np.clip(mi + red[0], -clamp, clamp),
            np.clip(mo + red[1], -clamp, clamp),
        )

    res = imru_run(
        ex,
        map_fn,
        reduce_fn,
        update_fn,
        (emb_in, emb_out),
        max_iterations=epochs,
    )
    mi, mo = res.model
    rows = [
        (int(vocab[i]), side, j, int(mat[i, j]))
        for side, mat in (("in", mi), ("out", mo))
        for i in range(V)
        for j in range(dim)
    ]
    out = spark.createDataFrame(
        rows, "vertex LONG, side STRING, dim INT, value LONG"
    )
    return out, SGNSModel(vocab, mi, mo, S, res.iterations)


def _floordiv_sql(a: str, b: int) -> str:
    """Floor division toward -inf (numpy ``floor_divide`` semantics)
    for possibly-negative ``a`` and constant positive ``b`` in pure
    BIGINT arithmetic — SQL's DIV truncates toward zero, which differs
    on negative operands."""
    return (
        f"((({a}) DIV {b}) - (CASE WHEN (({a}) % {b}) != 0 "
        f"AND ({a}) < 0 THEN 1 ELSE 0 END))"
    )


def train_sgns_sharded(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    dim: int = 8,
    epochs: int = 3,
    negatives: int = 2,
    lr_num: int = 1,
    lr_den: int = 4,
    seed: int = 11,
    scale_bits: int = 14,
    portable: bool = False,
    max_pair_weight: int = 1 << 15,
    num_partitions: int | None = None,
) -> DataFrame:
    """Model-sharded SGNS trainer — BIT-IDENTICAL to :func:`train_sgns`
    with the embedding state kept as a DataFrame instead of driver
    matrices (the VERDICT r3 scale fix).

    The driver never materializes V x dim state: init coordinates are
    computed distributed from the same counter coins, the vocabulary
    index for negatives is assigned by a sorted ``zipWithIndex`` (the
    same sorted-id order as the driver variant's ``np.array(sorted)``),
    and each epoch is three keyed exchanges —

    1. gather: examples join the embedding relation on center (IN
       vector) then on context (OUT vector);
    2. combine: per-example integer gradients explode to (vertex, j)
       rows and groupBy-sum — exact int64 addition is associative, so
       any partitioning and any core count reduce to the same totals
       (the property the driver variant gets from ``np.add.at`` +
       treeReduce);
    3. update: one co-partitioned join applies clamp(e + g) per
       coordinate, localCheckpoint'ed with fresh stats per epoch.

    Per-epoch shuffle volume is O(examples * dim + V * dim) rows and
    driver traffic is zero — the 100 TB path.  Returns the same
    ``DF(vertex, side, dim, value)`` relation as :func:`train_sgns`
    (no in-memory ``SGNSModel``; the relation IS the model).
    """
    if dim < 1 or dim > 64:
        raise ValueError("dim must be in [1, 64] (integer-exactness bound)")
    if epochs < 1 or negatives < 0 or lr_num < 1 or lr_den < 1:
        raise ValueError("epochs >= 1, negatives >= 0, lr_num/lr_den >= 1")
    if not 8 <= scale_bits <= 16:
        raise ValueError("scale_bits in [8, 16] keeps every term < 2^50")
    S = 1 << scale_bits
    spark = pairs.sparkSession

    from ..graph import choose_partitions
    from ..superstep import (
        iteration_conf,
        local_checkpoint_fresh_stats,
        release_local_checkpoint,
    )

    if vertices is None:
        vertices = (
            pairs.select(F.col("center").alias("id"))
            .union(pairs.select(F.col("context").alias("id")))
            .distinct()
        )
    vocab_ids = vertices.select("id").distinct()
    p = choose_partitions(pairs, lambda: pairs.count(), num_partitions)

    with iteration_conf(spark, p):
        # sorted dense index (idx == row in the driver variant's sorted
        # vocab array) without collecting — JVM-side dense rank (range
        # repartition + per-partition row_number; no per-row Python)
        from ..partitioning import dense_index

        vocab_map = dense_index(
            vocab_ids.select(F.col("id").cast("long")), ["id"], "idx",
            num_partitions=p,
        ).select(F.col("id").alias("v"), "idx")
        vocab_map = local_checkpoint_fresh_stats(
            vocab_map.repartition(p, "idx")
        )
        V = vocab_map.count()
        if V == 0:
            raise ValueError("empty vocabulary")

        # --- deterministic init, computed distributed ---------------
        emb = local_checkpoint_fresh_stats(
            vocab_map.select(F.col("v").alias("vertex"))
            .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))))
            .selectExpr(
                "vertex",
                "j",
                f"CAST({_coin_expr('sgi', ['vertex', 'j'], seed, portable)}"
                f" % {S} - {S // 2} AS BIGINT) AS vi",
                f"CAST({_coin_expr('sgo', ['vertex', 'j'], seed, portable)}"
                f" % {S} - {S // 2} AS BIGINT) AS vo",
            )
            .groupBy("vertex")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "vi", "vo"))),
                    lambda s: s["vi"],
                ).alias("vin"),
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "vi", "vo"))),
                    lambda s: s["vo"],
                ).alias("vout"),
            )
            .repartition(p, "vertex")
        )

        # --- examples: positives + counter-drawn negatives ----------
        pos = pairs.selectExpr(
            "center AS c", "context AS x", "CAST(1 AS INT) AS y",
            f"LEAST(CAST(n_pairs AS BIGINT), {max_pair_weight}) AS n",
        )
        if negatives > 0:
            neg = (
                pairs.withColumn(
                    "m", F.explode(F.sequence(F.lit(0), F.lit(negatives - 1)))
                )
                .selectExpr(
                    "center AS c",
                    f"LEAST(CAST(n_pairs AS BIGINT), {max_pair_weight}) AS n",
                    f"CAST({_coin_expr('sgn', ['center', 'context', 'm'], seed, portable)}"
                    f" % {V} AS BIGINT) AS idx",
                )
                .join(vocab_map, "idx")
                .selectExpr("c", "v AS x", "CAST(0 AS INT) AS y", "n")
            )
            examples = pos.unionByName(neg)
        else:
            examples = pos
        ex = local_checkpoint_fresh_stats(examples.repartition(p, "c"))

        half, quarter_den, upd_den = S // 2, 4 * S, lr_den * S
        clamp = 2 * S

        for _epoch in range(epochs):
            # gather both sides' epoch-start vectors
            scored = (
                ex.join(emb.selectExpr("vertex AS c", "vin"), "c")
                .join(emb.selectExpr("vertex AS x", "vout"), "x")
                .withColumn(
                    "s",
                    F.aggregate(
                        F.zip_with("vin", "vout", lambda a, b: a * b),
                        F.lit(0).cast("long"),
                        lambda acc, v: acc + v,
                    ),
                )
                .withColumn(
                    "sigma",
                    F.expr(
                        f"GREATEST(0L, LEAST(CAST({S} AS BIGINT), "
                        f"{half} + {_floordiv_sql('s', quarter_den)}))"
                    ),
                )
                .withColumn("g", F.col("sigma") - F.col("y").cast("long") * S)
                .withColumn("w", -(F.lit(lr_num) * F.col("n") * F.col("g")))
            )
            # per-coordinate gradient rows: center row <- IN gradient
            # (from the context's OUT vector), context row <- OUT
            # gradient (from the center's IN vector)
            gin_rows = scored.selectExpr(
                "c AS vertex",
                f"posexplode(transform(vout, v -> {_floordiv_sql('w * v', upd_den)}))"
                " AS (j, gi)",
            ).selectExpr("vertex", "j", "gi", "CAST(0 AS BIGINT) AS go")
            gout_rows = scored.selectExpr(
                "x AS vertex",
                f"posexplode(transform(vin, v -> {_floordiv_sql('w * v', upd_den)}))"
                " AS (j, go)",
            ).selectExpr("vertex", "j", "CAST(0 AS BIGINT) AS gi", "go")
            gagg = (
                gin_rows.unionByName(gout_rows)
                .groupBy("vertex", "j")
                .agg(F.sum("gi").alias("gi"), F.sum("go").alias("go"))
                .groupBy("vertex")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("j", "gi", "go"))),
                        lambda s: s["gi"],
                    ).alias("gin"),
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("j", "gi", "go"))),
                        lambda s: s["go"],
                    ).alias("gout"),
                )
            )
            zeros = F.array_repeat(F.lit(0).cast("long"), dim)
            new_emb = (
                emb.join(gagg, "vertex", "left_outer")
                .select(
                    "vertex",
                    F.zip_with(
                        "vin",
                        F.coalesce(F.col("gin"), zeros),
                        lambda e, g: F.greatest(
                            F.lit(-clamp).cast("long"),
                            F.least(F.lit(clamp).cast("long"), e + g),
                        ),
                    ).alias("vin"),
                    F.zip_with(
                        "vout",
                        F.coalesce(F.col("gout"), zeros),
                        lambda e, g: F.greatest(
                            F.lit(-clamp).cast("long"),
                            F.least(F.lit(clamp).cast("long"), e + g),
                        ),
                    ).alias("vout"),
                )
                .repartition(p, "vertex")
            )
            old = emb
            emb = local_checkpoint_fresh_stats(new_emb)
            release_local_checkpoint(old)

        out = emb.selectExpr(
            "vertex",
            "posexplode(vin) AS (j, value)",
        ).selectExpr(
            "vertex", "'in' AS side", "CAST(j AS INT) AS dim", "value"
        ).unionByName(
            emb.selectExpr(
                "vertex",
                "posexplode(vout) AS (j, value)",
            ).selectExpr(
                "vertex", "'out' AS side", "CAST(j AS INT) AS dim", "value"
            )
        )
    return out
