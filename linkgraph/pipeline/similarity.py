"""Similarity search over an embeddings table (vec_id, embedding
array<float>, ...).

- cosine_topk: brute-force top-k — the exactness baseline. Dot product
  and norms are JVM-side fold expressions in double (deterministic
  left-to-right accumulation, so any engine reproducing the fold gets
  bit-identical sums).
- lsh_cosine_topk: random-hyperplane LSH bucketing (signs of H fixed
  seeded projections -> bucket key), candidates restricted to bucket
  mates (multi-probe across bands). The scale path: candidate
  generation is a co-grouped join on bucket, linear in corpus size.
  Projections run as one numpy matmul per Arrow batch (pandas UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0.0 AS DOUBLE),"
            f" (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """(qid, vec_id, sim) — exact cosine top-k of each query against the
    corpus (self excluded). ``queries`` defaults to the corpus itself
    (use a filtered subset for realistic fan-out).

    Brute force by design: the correctness baseline the LSH variant is
    measured against. The join broadcasts the (small) query side.
    """
    if queries is None:
        queries = embeddings
    q = queries.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select("vec_id", F.col("embedding").alias("c_emb"))
    sims = (
        c.join(F.broadcast(q), q["qid"] != c["vec_id"])
        .withColumn(
            "sim",
            F.round(
                _dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), round_to
            ),
        )
        .select("qid", "vec_id", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def knn_label_accuracy(
    embeddings: DataFrame,
    k: int = 10,
    n_queries: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """(qid, pred_label, true_label, correct) — k-nearest-neighbor
    majority-vote label evaluation over the embeddings table, the
    standard intrinsic check that an embedding space separates its
    labels (and that an ANN index preserves enough neighborhood
    structure to classify with).

    Neighbors come from :func:`cosine_topk` (exact brute force, self
    excluded, deterministic (sim DESC, vec_id ASC) tie-break); the
    prediction is the most frequent neighbor label, ties broken by the
    smallest label — both total orders, so the whole evaluation is
    reproducible across engines and partitionings. Queries are the
    ``n_queries`` smallest vec_ids (deterministic slice, broadcast
    side of the brute-force join; swap in an LSH/IVF candidate set for
    the at-scale variant — the vote is identical).
    """
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    topk = cosine_topk(embeddings, queries=queries, k=k, round_to=round_to)
    return _majority_vote(topk, embeddings)


def _majority_vote(topk: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Shared vote/score tail of the kNN evaluations: most frequent
    neighbor label (ties to the smallest label) vs the query's own
    label. ``topk`` is any (qid, vec_id, ...) neighbor relation —
    exact or ANN; the vote is identical."""
    votes = (
        topk.join(
            embeddings.select("vec_id", F.col("label").alias("lab")), "vec_id"
        )
        .groupBy("qid", "lab")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("lab").asc())
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("lab").alias("pred_label"))
    )
    truth = embeddings.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("true_label")
    )
    return pred.join(truth, "qid").select(
        "qid",
        "pred_label",
        "true_label",
        (F.col("pred_label") == F.col("true_label")).cast("int").alias("correct"),
    )


def _ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int,
    method: str,
    round_to: int,
    **ann_kwargs,
) -> DataFrame:
    """Dispatch to one of the ANN tiers with a shared output contract
    (qid, vec_id, score-ish column)."""
    if method == "lsh":
        return lsh_cosine_topk(
            embeddings, dim, queries=queries, k=k, round_to=round_to,
            **ann_kwargs,
        )
    if method == "ivf":
        return ivf_cosine_topk(
            embeddings, queries=queries, k=k, round_to=round_to, **ann_kwargs
        )
    if method == "pq":
        return pq_topk(
            embeddings, queries=queries, k=k, round_to=round_to, **ann_kwargs
        )
    raise ValueError(f"method must be lsh|ivf|pq, got {method!r}")


def knn_label_accuracy_ann(
    embeddings: DataFrame,
    dim: int,
    k: int = 10,
    n_queries: int = 64,
    method: str = "lsh",
    round_to: int = 4,
    **ann_kwargs,
) -> DataFrame:
    """kNN majority-vote label evaluation with the neighbor set drawn
    from an ANN tier (``method``: sign-LSH buckets, IVF probe join, or
    PQ ADC codes) instead of the brute-force scan — the at-scale
    composition the exact :func:`knn_label_accuracy` documents
    (VERDICT r3 item #4). The vote is IDENTICAL (shared
    :func:`_majority_vote`); only the candidate generation changes, so
    accuracy degradation measures exactly the index's neighborhood
    loss. Same output schema as the exact variant."""
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    topk = _ann_topk(
        embeddings, queries, dim, k, method, round_to, **ann_kwargs
    )
    return _majority_vote(topk, embeddings)


def ann_recall(
    embeddings: DataFrame,
    dim: int,
    k: int = 10,
    n_queries: int = 64,
    method: str = "lsh",
    round_to: int = 4,
    exact_round_to: int | None = None,
    **ann_kwargs,
) -> DataFrame:
    """(qid, n_exact, n_hit, recall) — per-query recall of the ANN
    tier's top-k against the exact brute-force top-k (the standard
    index-quality report). ``recall`` = |ANN ∩ exact| / |exact|.
    ``round_to`` rounds the ANN tier's score before ranking;
    ``exact_round_to`` (default: same) rounds the exact cosine side —
    split so the PQ tier can keep its 6dp ADC distances while the
    exact ranking stays at the 4dp the brute-force gate uses."""
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    exact = cosine_topk(
        embeddings,
        queries=queries,
        k=k,
        round_to=round_to if exact_round_to is None else exact_round_to,
    ).select("qid", "vec_id")
    ann = _ann_topk(
        embeddings, queries, dim, k, method, round_to, **ann_kwargs
    ).select("qid", F.col("vec_id").alias("ann_id"))
    hits = exact.join(
        ann,
        (exact["qid"] == ann["qid"]) & (exact["vec_id"] == ann["ann_id"]),
        "left_semi",
    ).groupBy("qid").agg(F.count(F.lit(1)).alias("n_hit"))
    base = exact.groupBy("qid").agg(F.count(F.lit(1)).alias("n_exact"))
    return base.join(hits, "qid", "left_outer").select(
        "qid",
        "n_exact",
        F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4
        ).alias("recall"),
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """(dim, n_planes) hyperplane components, uniform in [-1, 1) from
    md5 draws (linkgraph.phash) rather than a numpy RNG: any symmetric
    component law is a valid sign-LSH family, and md5 derivation lets
    the driver oracle embed the SAME values as SQL literals
    (__spark_entry__._lsh_topk_sql) — repr(float) round-trips exactly,
    so both engines project against bit-identical planes."""
    from ..phash import md5_uniform

    return np.array(
        [
            [md5_uniform("lshplane", p * dim + d, seed) for p in range(n_planes)]
            for d in range(dim)
        ],
        dtype=np.float64,
    )


def lsh_bucket_ids(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, band, bucket) — sign-LSH bucket per band. One matmul per
    Arrow batch; deterministic seeded hyperplanes."""
    planes = _hyperplanes(dim, n_planes, seed)
    per_band = n_planes // bands
    weights = (1 << np.arange(per_band, dtype=np.int64))

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets_udf(embs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        signs = (m @ planes) > 0
        out = []
        for row in signs:
            out.append(
                [int(row[b * per_band : (b + 1) * per_band] @ weights) for b in range(bands)]
            )
        return pd.Series(out)

    return embeddings.select(
        "vec_id", F.posexplode(buckets_udf("embedding")).alias("band", "bucket")
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    kmeans_iterations: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: centroids trained with the
    IMRU k-means, each corpus vector assigned to its nearest centroid
    (one numpy matmul per Arrow batch), and each query scored only
    against the vectors of its ``n_probe`` nearest clusters.

    The 100 TB shape: the assignment is a linear pass, the probe join is
    an equi-join on cluster id (candidates ~= n_probe/n_clusters of the
    corpus), and the centroid table is broadcast. Deterministic:
    k-means init is the k lowest-id vectors; ties break to the lowest
    cluster index / vec_id.
    """
    from ..imru import kmeans

    if queries is None:
        queries = embeddings
    spark = embeddings.sparkSession

    corpus = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("features")
    )
    res = kmeans(corpus, k=n_clusters, max_iterations=kmeans_iterations)
    centroids = np.asarray(res.model, dtype=np.float64)
    cnorm = np.linalg.norm(centroids, axis=1)
    cnorm[cnorm == 0] = 1.0

    @pandas_udf(T.IntegerType())
    def assign_udf(embs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ (centroids / cnorm[:, None]).T
        return pd.Series(sims.argmax(axis=1).astype("int32"))

    assigned = embeddings.select(
        "vec_id", F.col("embedding").alias("c_emb"), assign_udf("embedding").alias("cid")
    )

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(embs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ (centroids / cnorm[:, None]).T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    probes = queries.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.explode(probe_udf("embedding")).alias("cid"),
    )
    sims = (
        probes.join(assigned, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn(
            "sim",
            F.round(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), round_to),
        )
        .select("qid", "vec_id", "sim")
        .dropDuplicates(["qid", "vec_id"])
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    m: int = 4,
    ks: int = 8,
    kmeans_iterations: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Product-quantization ADC top-k — the COMPRESSION tier of the ANN
    family (brute/LSH/IVF/PQ): squared-L2 nearest neighbors computed
    from ``m``-byte codes instead of full vectors.

    Train: the embedding is split into ``m`` equal subspaces and each
    subspace gets its own ``ks``-centroid codebook from the IMRU
    k-means (deterministic: init = the ks lowest-id subvectors, ties to
    the lowest cluster index — exactly the IVF trainer's rule, so the
    whole train->encode->scan chain is oracle-unrollable). Encode: each
    corpus vector becomes ``m`` small codes (argmin squared distance
    per subspace). Search (ADC): each query precomputes an
    ``m x ks`` distance table to every sub-centroid; a vector's
    approximate distance is the sum of ``m`` table lookups at its
    codes.

    100 TB shape: the scan side never touches floats — the per-vector
    work is ``m`` array lookups over a broadcast (query, table) row,
    a pure JVM codegen expression over a 4-entry code array (the
    vectors themselves stay on disk; a 256-byte embedding reads as m
    bytes, the 64x IO compression that makes exhaustive re-ranking
    feasible). numpy touches only the m*ks-entry codebooks (driver
    side) and the tiny query batch; compose with the IVF probe join
    for sub-linear candidate sets.

    Returns (qid, vec_id, dist) — dist ascending squared-L2, rounded
    to ``round_to`` BEFORE ranking, ties to the lowest vec_id.
    """
    from ..imru import imru_run

    if queries is None:
        queries = embeddings
    first = embeddings.select("embedding").first()
    if first is None:
        raise ValueError("pq_topk: empty embeddings table")
    dim = len(first["embedding"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    sub = dim // m

    corpus = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # all m sub-codebooks train in ONE fused IMRU loop — the subspaces'
    # Lloyd updates are independent, so one corpus pass per iteration
    # carries all m (ks x sub) partial sums instead of m separate loops
    # re-scanning the corpus (identical centers: same init rule, same
    # argmin ties, per-subspace fixpoints are no-ops once reached)
    first = corpus.orderBy("vec_id").limit(ks).select("v").collect()
    init = np.stack(
        [
            np.array([list(r["v"])[s * sub : (s + 1) * sub] for r in first])
            for s in range(m)
        ]
    )  # (m, ks, sub)

    def _map(pdf: pd.DataFrame, model: np.ndarray):
        x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        sums = np.zeros_like(model)
        counts = np.zeros((m, ks), dtype=np.int64)
        for s in range(m):
            xs = x[:, s * sub : (s + 1) * sub]
            d = ((xs[:, None, :] - model[s][None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            np.add.at(sums[s], a, xs)
            np.add.at(counts[s], a, 1)
        return sums, counts

    def _update(model: np.ndarray, red):
        sums, counts = red
        new = model.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz][:, None]
        return new

    res = imru_run(
        corpus,
        _map,
        lambda a, b: (a[0] + b[0], a[1] + b[1]),
        _update,
        init,
        max_iterations=kmeans_iterations,
        should_terminate=lambda old, new, it: float(np.abs(new - old).sum()) <= 1e-9,
    )
    codebooks = np.asarray(res.model, dtype=np.float64)  # (m, ks, sub)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode_udf(embs: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        n = x.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        for s in range(m):
            xs = x[:, s * sub : (s + 1) * sub]
            # (n, ks) squared distances; argmin ties -> lowest index
            d = ((xs[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d.argmin(axis=1)
        return pd.Series([row.tolist() for row in codes])

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def dtable_udf(embs: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        out = []
        for row in x:
            t = np.empty(m * ks, dtype=np.float64)
            for s in range(m):
                qs = row[s * sub : (s + 1) * sub]
                t[s * ks : (s + 1) * ks] = ((codebooks[s] - qs[None, :]) ** 2).sum(axis=1)
            out.append(t.tolist())
        return pd.Series(out)

    coded = embeddings.select("vec_id", encode_udf("embedding").alias("codes"))
    q = queries.select(
        F.col("vec_id").alias("qid"), dtable_udf("embedding").alias("dt")
    )
    # ADC: m element_at lookups, whole-stage codegen, no Python
    adc = (
        f"round(aggregate(sequence(0, {m - 1}), CAST(0.0 AS DOUBLE),"
        f" (acc, s) -> acc + element_at(dt, s * {ks} + element_at(codes, s + 1) + 1)),"
        f" {round_to})"
    )
    sims = (
        coded.join(F.broadcast(q), F.col("qid") != F.col("vec_id"))
        .withColumn("dist", F.expr(adc))
        .select("qid", "vec_id", "dist")
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def lsh_cosine_topk(
    embeddings: DataFrame,
    dim: int,
    queries: DataFrame | None = None,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    round_to: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: only candidates sharing >=1 LSH band
    bucket with the query are scored. Same output shape as cosine_topk."""
    if queries is None:
        queries = embeddings
    all_buckets = lsh_bucket_ids(embeddings, dim, n_planes, bands, seed)
    q_ids = queries.select(F.col("vec_id").alias("qid"))
    q_buckets = all_buckets.join(
        q_ids, all_buckets["vec_id"] == q_ids["qid"]
    ).select("qid", "band", "bucket")
    cands = (
        all_buckets.join(q_buckets, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"))
    c = embeddings.select("vec_id", F.col("embedding").alias("c_emb"))
    sims = (
        cands.join(q, "qid")
        .join(c, "vec_id")
        .withColumn(
            "sim",
            F.round(
                _dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), round_to
            ),
        )
        .select("qid", "vec_id", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def embedding_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    round_to: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(vec_id_a, vec_id_b, sim) — embedding-cosine near-duplicate
    pairs: every unordered pair sharing >= 1 sign-LSH band bucket whose
    EXACT cosine (rounded to ``round_to``) is >= ``threshold``.

    The embedding tier of the dedup matrix (exact hash / n-gram Jaccard
    / MinHash-LSH / SimHash / embedding cosine). The 100 TB shape:
    candidates come from ONE groupBy over the banded frame with
    map-side pair generation (linear in corpus x bands, never
    all-pairs; see dedup.bucket_candidate_pairs), and only the
    O(near-dup) candidate set rejoins the vectors for exact scoring.
    ``max_bucket_size`` skips pathological buckets (e.g. the all-zeros
    band) exactly as the text-LSH tiers do; recall comes from the
    remaining bands.
    """
    from .dedup import bucket_candidate_pairs

    buckets = lsh_bucket_ids(embeddings, dim, n_planes, bands, seed)
    cands = bucket_candidate_pairs(
        buckets, ["band", "bucket"], "vec_id", max_bucket_size,
        out_a="vec_id_a", out_b="vec_id_b",
    )
    ea = embeddings.select(
        F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("a_emb")
    )
    eb = embeddings.select(
        F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("b_emb")
    )
    return (
        cands.join(ea, "vec_id_a")
        .join(eb, "vec_id_b")
        .withColumn(
            "sim",
            F.round(
                _dot("a_emb", "b_emb") / (_norm("a_emb") * _norm("b_emb")), round_to
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("vec_id_a", "vec_id_b", "sim")
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 16,
    tau: float = 0.9,
    kmeans_iterations: int = 5,
    round_to: int = 4,
    max_cluster_size: int | None = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embedding space with the IMRU k-means, then prune
    near-duplicate pairs WITHIN each cluster — ``(vec_id, cluster,
    kept)`` where a vector is dropped iff a LOWER-id member of its own
    cluster has cosine >= ``tau`` with it (deterministic
    keep-lowest-id representative rule; ``kept`` is 0/1).

    This is the embedding-space counterpart of the text tiers: exact /
    MinHash / SimHash / span dedup all need lexical overlap, while
    semantic dedup collapses paraphrases. Clustering is what makes it
    tractable — candidate pairs are confined to cluster-mates, the
    SemDeDup trade of O(sum of cluster-size^2) comparisons for
    global-pair completeness (a cross-cluster near-dup survives; at k
    clusters of even size that is a k-fold reduction over the
    quadratic scan).

    100 TB shape: centroids broadcast (same IMRU trainer and
    max-cosine assignment rule as :func:`ivf_cosine_topk`, so the
    whole train->assign->prune chain unrolls into the SQL oracle);
    the self-join keys on cluster id, and ``max_cluster_size``
    applies the SAME skew cap as the MinHash bucket join: a
    pathological cluster (the near-origin catch-all a web-scale
    embedding space always grows) makes pair generation quadratic in
    one task while carrying little per-pair signal, so oversized
    clusters skip pruning (their members are all KEPT, disclosed by
    the cap) rather than stalling the job. Pass ``None`` to disable
    (the exact small-scale gate does); raising ``n_clusters`` shrinks
    clusters under the cap.
    """
    from ..imru import kmeans

    corpus = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("features")
    )
    res = kmeans(corpus, k=n_clusters, max_iterations=kmeans_iterations)
    centroids = np.asarray(res.model, dtype=np.float64)
    cnorm = np.linalg.norm(centroids, axis=1)
    cnorm[cnorm == 0] = 1.0

    @pandas_udf(T.IntegerType())
    def assign_udf(embs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ (centroids / cnorm[:, None]).T
        return pd.Series(sims.argmax(axis=1).astype("int32"))

    assigned = embeddings.select(
        "vec_id",
        F.col("embedding").alias("emb"),
        assign_udf("embedding").alias("cluster"),
    )
    if max_cluster_size is not None:
        small = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_cluster_size)
            .select("cluster")
        )
        prunable = assigned.join(small, "cluster", "left_semi")
    else:
        prunable = assigned
    lo = prunable.select(
        F.col("cluster"), F.col("vec_id").alias("u"), F.col("emb").alias("u_emb")
    )
    hi = prunable.select(
        F.col("cluster"), F.col("vec_id").alias("v"), F.col("emb").alias("v_emb")
    )
    dropped = (
        lo.join(hi, "cluster")
        .filter(F.col("u") < F.col("v"))
        .withColumn(
            "sim",
            F.round(
                _dot("u_emb", "v_emb") / (_norm("u_emb") * _norm("v_emb")),
                round_to,
            ),
        )
        .filter(F.col("sim") >= tau)
        .select("v")
        .distinct()
    )
    return assigned.join(
        dropped, assigned["vec_id"] == dropped["v"], "left_outer"
    ).select(
        "vec_id",
        F.col("cluster").cast("long"),
        F.when(F.col("v").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("kept"),
    )
