"""Distributed sketches over a documents table.

Two sketch families, both chosen for ORACLE-REPRODUCIBILITY (portable
md5 hashing makes every counter bit-identical in Spark and DuckDB,
unlike Spark's built-in HLL/CMS aggregates):

KMV (k-minimum-values) distinct-count sketch — the classic
bottom-k estimator (Bar-Yossef et al., RANDOM'02): hash every distinct
element to a uniform integer, keep the k smallest hashes, estimate

    D  ≈  (k - 1) * M / h_(k)

where ``h_(k)`` is the k-th smallest hash and ``M`` the hash-space
size. Relative error ~ 1/sqrt(k).

Why this instead of ``approx_count_distinct``: Spark's built-in HLL is
not reproducible by an external engine, so it can't pass the driver's
DuckDB oracle gate. KMV over the portable md5 hash (linkgraph.phash) is
bit-deterministic in BOTH engines — the sketch itself is
oracle-verifiable, not just its accuracy.

The 100 TB shape: tokens never leave their partitions un-aggregated —
the plan is explode -> per-partition partial distinct -> one shuffle of
distinct hashes -> TakeOrdered(k) (Spark plans orderBy+limit as
per-partition top-k + a k-row merge on one reducer, NOT a global sort).
The driver sees k rows, never the vocabulary. This is the sketch tier of
the vocabulary operator (textstats.vocabulary is the exact tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..phash import md5_int_sql

#: hash-space size for the 15-hex-digit md5 draw (2^60, BIGINT-exact)
KMV_M = 16 ** 15


def kmv_distinct_tokens(docs: DataFrame, k: int = 256) -> DataFrame:
    """One-row DF(k_used BIGINT, kth_min_hash BIGINT,
    est_distinct DOUBLE): KMV estimate of the number of distinct
    whitespace tokens in the corpus.

    When the true vocabulary has fewer than ``k`` terms the bottom-k
    set IS the vocabulary and the exact count is returned
    (``est_distinct = k_used``), the standard small-cardinality
    degeneration of KMV.
    """
    if k < 2:
        raise ValueError("kmv_distinct_tokens: k must be >= 2")
    hashes = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .select(F.expr(md5_int_sql("term", 15)).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    return hashes.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_min_hash"),
    ).select(
        "k_used",
        "kth_min_hash",
        F.round(
            F.when(F.col("k_used") < k, F.col("k_used").cast("double")).otherwise(
                (F.col("k_used") - 1).cast("double")
                * F.lit(float(KMV_M))
                / F.col("kth_min_hash").cast("double")
            ),
            6,
        ).alias("est_distinct"),
    )


def kmv_sql(k: int = 256) -> str:
    """DuckDB oracle for :func:`kmv_distinct_tokens` — the identical
    md5-digit hash and estimator arithmetic."""
    hv = md5_int_sql("term", 15)
    return (
        "WITH toks AS (SELECT DISTINCT t AS term FROM ("
        " SELECT unnest(string_split(text, ' ')) AS t FROM documents)"
        " WHERE t != ''),"
        f" h AS (SELECT {hv} AS hv FROM toks),"
        f" bk AS (SELECT hv FROM h ORDER BY hv LIMIT {k})"
        " SELECT COUNT(*)::BIGINT AS k_used, MAX(hv)::BIGINT AS kth_min_hash,"
        f" ROUND(CASE WHEN COUNT(*) < {k} THEN COUNT(*)::DOUBLE"
        f"  ELSE (COUNT(*) - 1)::DOUBLE * {float(KMV_M)!r} / MAX(hv)::DOUBLE END, 6)"
        " AS est_distinct FROM bk"
    )


def _cms_bucket_sql(term_sql: str, j: int, width: int, seed: int, portable: bool) -> str:
    """Row-j CMS bucket of a term: hash to [0, width). Portable mode =
    15 md5 hex digits (bit-identical in DuckDB); fast mode = xxhash64
    (JVM-native, Spark-only). pmod keeps the result non-negative."""
    if portable:
        arg = f"'cms:{seed}:{j}:' || {term_sql}"
        return f"pmod({md5_int_sql(arg, 15)}, {width})"
    return f"pmod(xxhash64('cms:{seed}:{j}:', {term_sql}), {width})"


def cms_sketch(
    docs: DataFrame,
    depth: int = 4,
    width: int = 512,
    portable: bool = False,
    seed: int = 42,
    pre_aggregate: bool = True,
) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan) of the corpus's
    whitespace-token frequencies: DF(j, bucket, cnt) with depth*width
    counters, cnt = number of token occurrences hashing to (j, bucket).

    The 100 TB shape: with ``pre_aggregate`` (batch default) terms are
    counted exactly first (one vocabulary-keyed shuffle, map-side
    combined) and each DISTINCT term is hashed ``depth`` times — hash
    cost scales with the vocabulary, not the corpus. With
    ``pre_aggregate=False`` (the streaming path) every occurrence
    emits ``depth`` (j, bucket) rows and the ONLY exchange is the
    final groupBy over depth*width keys — partial aggregation
    collapses each partition to at most depth*width rows map-side.
    Either way the driver-visible state is fixed-size no matter how
    many tokens stream through, and the counters are identical.
    """
    toks = docs.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    jb_sql = (
        "explode(array("
        + ", ".join(
            f"struct(CAST({j} AS INT) AS j,"
            f" CAST({_cms_bucket_sql('term', j, width, seed, portable)} AS INT)"
            f" AS bucket)"
            for j in range(depth)
        )
        + ")) AS jb"
    )
    if pre_aggregate:
        # batch fast path: aggregate exact per-term counts first, then
        # hash each DISTINCT term once — depth hashes per vocabulary
        # entry instead of per token occurrence (identical counters;
        # 11.6s -> ~1s on the sf0.1 portable-md5 gate). Streaming
        # callers must pass pre_aggregate=False: Structured Streaming
        # forbids chained aggregations, and per-occurrence hashing is
        # the true streaming CMS anyway.
        tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
        rows = tf.selectExpr(jb_sql, "c").select("jb.j", "jb.bucket", "c")
        return rows.groupBy("j", "bucket").agg(F.sum("c").alias("cnt"))
    rows = toks.selectExpr(jb_sql).select("jb.j", "jb.bucket")
    return rows.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_probe_counts(
    docs: DataFrame,
    probes: list[str],
    depth: int = 4,
    width: int = 512,
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Estimate the corpus frequency of each probe term from the CMS:
    DF(term, est_count BIGINT) where est_count = min over the depth
    rows of the probed counter — the classic CMS point query, with the
    one-sided guarantee est >= true and E[est - true] <= N/width.

    Estimating k probe frequencies costs the fixed-size sketch plus a
    broadcast join of k*depth probe cells — the corpus token relation
    itself is never re-scanned per probe. Every counter is an exact
    integer count over deterministic buckets, so the estimate (not
    just its accuracy) is oracle-verifiable.
    """
    if not probes:
        raise ValueError("cms_probe_counts: probes must be non-empty")
    spark = docs.sparkSession
    sk = cms_sketch(docs, depth, width, portable, seed)
    probe_df = spark.createDataFrame([(p,) for p in probes], "term string")
    cells = probe_df.selectExpr(
        "term",
        "explode(array("
        + ", ".join(
            f"struct(CAST({j} AS INT) AS j,"
            f" CAST({_cms_bucket_sql('term', j, width, seed, portable)} AS INT)"
            f" AS bucket)"
            for j in range(depth)
        )
        + ")) AS jb",
    ).select("term", "jb.j", "jb.bucket")
    return (
        cells.join(F.broadcast(sk), ["j", "bucket"], "left_outer")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def cms_probe_sql(
    probes: list[str],
    depth: int = 4,
    width: int = 512,
    seed: int = 42,
) -> str:
    """DuckDB oracle for :func:`cms_probe_counts` (portable mode): the
    identical md5 bucket hashes, counters, and min-over-rows query."""
    def bucket(term_sql: str, j: int) -> str:
        inner = md5_int_sql(f"'cms:{seed}:{j}:' || {term_sql}", 15)
        return f"(({inner}) % {width} + {width}) % {width}"

    probe_rows = ", ".join(f"('{p}')" for p in probes)
    jb_union = " UNION ALL ".join(
        f"SELECT term, {j} AS j, CAST({bucket('term', j)} AS INT) AS bucket"
        " FROM probes"
        for j in range(depth)
    )
    tok_union = " UNION ALL ".join(
        f"SELECT {j} AS j, CAST({bucket('term', j)} AS INT) AS bucket FROM toks"
        for j in range(depth)
    )
    return (
        "WITH toks AS (SELECT t AS term FROM (SELECT"
        " unnest(string_split(text, ' ')) AS t FROM documents) WHERE t != ''),"
        f" cells AS ({tok_union}),"
        " sk AS (SELECT j, bucket, COUNT(*)::BIGINT AS cnt FROM cells"
        "  GROUP BY j, bucket),"
        f" probes(term) AS (VALUES {probe_rows}),"
        f" pc AS ({jb_union})"
        " SELECT p.term, CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est_count"
        " FROM pc p LEFT JOIN sk s ON s.j = p.j AND s.bucket = p.bucket"
        " GROUP BY p.term"
    )


def kmv_distinct_by(
    docs: DataFrame, group_col: str = "lang", k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-token estimates: DF(<group_col>, k_used,
    kth_min_hash, est_distinct) — one bottom-k sketch per group (e.g.
    vocabulary size per language), same estimator and degeneration rule
    as :func:`kmv_distinct_tokens`.

    Shape: distinct (group, hash) pairs -> per-group bottom-k via a
    rank window (Spark pushes the k-limit into the sort as
    WindowGroupLimit, so each partition retains at most k rows per
    group before the exchange) -> one k-row-per-group aggregate. The
    driver sees one row per group regardless of corpus size.
    """
    if k < 2:
        raise ValueError("kmv_distinct_by: k must be >= 2")
    from pyspark.sql import Window

    pairs = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .select("grp", F.expr(md5_int_sql("term", 15)).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("hv")
    bottom = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return (
        bottom.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("k_used"), F.max("hv").alias("kth_min_hash"))
        .select(
            F.col("grp").alias(group_col),
            "k_used",
            "kth_min_hash",
            F.round(
                F.when(
                    F.col("k_used") < k, F.col("k_used").cast("double")
                ).otherwise(
                    (F.col("k_used") - 1).cast("double")
                    * F.lit(float(KMV_M))
                    / F.col("kth_min_hash").cast("double")
                ),
                6,
            ).alias("est_distinct"),
        )
    )


def kmv_by_sql(group_col: str = "lang", k: int = 64) -> str:
    """DuckDB oracle for :func:`kmv_distinct_by` — identical hash,
    rank window, and estimator."""
    hv = md5_int_sql("term", 15)
    return (
        f"WITH pairs AS (SELECT DISTINCT {group_col} AS grp, {hv} AS hv FROM ("
        f" SELECT {group_col}, unnest(string_split(text, ' ')) AS term"
        f" FROM documents) WHERE term != ''),"
        f" bk AS (SELECT grp, hv FROM ("
        f"  SELECT grp, hv, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hv)"
        f"  AS rn FROM pairs) WHERE rn <= {k})"
        f" SELECT grp AS {group_col}, COUNT(*)::BIGINT AS k_used,"
        f" MAX(hv)::BIGINT AS kth_min_hash,"
        f" ROUND(CASE WHEN COUNT(*) < {k} THEN COUNT(*)::DOUBLE"
        f"  ELSE (COUNT(*) - 1)::DOUBLE * {float(KMV_M)!r} / MAX(hv)::DOUBLE END,"
        f" 6) AS est_distinct FROM bk GROUP BY grp"
    )
