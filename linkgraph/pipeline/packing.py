"""Token-budget sequence packing — concatenate-then-chunk batch
assembly for pretraining pipelines.

A training run consumes fixed-length context windows; the standard way
to fill them from variable-length documents is to CONCATENATE documents
in a deterministic order and CHUNK the stream every ``budget`` tokens
(a document may straddle a chunk boundary). This operator assigns every
document its place in that stream without ever materializing the
stream: each doc gets ``(group, bin, offset)`` from pure window
arithmetic over token counts.

Distributed shape (the 100 TB design): a single global stream would
serialize on one partition (a global ORDER BY window), so documents are
first hashed into ``n_groups`` independent streams — the group coin is
the usual counter-based hash of (doc_id, seed) — and the running-sum
window runs PER GROUP, ordered by doc_id: ``n_groups`` parallel
windows, one shuffle, each group's state independent of every other.
At cluster scale, set ``n_groups`` to a few times the executor count;
each group is one training shard.

Outputs per document: ``group`` (the stream it lives in), ``start``
(token offset in the group's concatenated stream), ``bin`` = start //
budget (the context window its FIRST token lands in), ``offset`` =
start % budget (position within that window), ``n_spans`` = how many
windows the document touches (1 = fits inside one window). All integer
columns, so the driver's oracle gate hash-matches exactly; portable
mode draws the group coin with md5 digit terms reproducible in DuckDB
(``pack_group_sql``), production mode with xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..phash import md5_digits_spark_sql as _md5_digits_spark_sql
from ..phash import md5_int_sql as _md5_int_sql


def _group_arg(id_sql: str, seed: int) -> str:
    return f"concat_ws(':', 'pk', CAST({id_sql} AS STRING), '{seed}')"


def pack_group_sql(id_sql: str, n_groups: int, seed: int) -> str:
    """Engine-neutral SQL (valid in Spark SQL AND DuckDB) for the
    stream/group assignment of row ``id_sql`` — the oracle-side
    spelling (md5 digit terms); the engine's portable mode computes the
    identical value via the faster conv() spelling."""
    return f"({_md5_int_sql(_group_arg(id_sql, seed))} % {n_groups})"


def _spark_group(id_sql: str, n_groups: int, seed: int, portable: bool) -> str:
    arg = _group_arg(id_sql, seed)
    if portable:
        return f"({_md5_digits_spark_sql(f'md5({arg})', 6)} % {n_groups})"
    return f"pmod(xxhash64({arg}), {n_groups})"


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_groups: int = 64,
    id_col: str = "doc_id",
    token_col: str | None = None,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(id_col, n_tokens, group, start, bin, offset, n_spans) — each
    document's place in its group's concatenated token stream, chunked
    every ``budget`` tokens.

    ``token_col`` names a precomputed token-count column; when None the
    whitespace count ``size(split(text, ' '))`` is used (the
    textstats.token_count convention). Zero-token documents still get a
    position (they occupy no tokens: n_spans counts the windows the doc
    overlaps, 0 for an empty doc).
    """
    if budget < 1 or n_groups < 1:
        raise ValueError("budget and n_groups must be >= 1")
    if token_col is None:
        toks = F.size(F.split(F.col("text"), " ")).cast("long")
    else:
        toks = F.col(token_col).cast("long")
    g = F.expr(_spark_group(id_col, n_groups, seed, portable)).cast("int")
    base = docs.select(
        F.col(id_col), toks.alias("n_tokens"), g.alias("group")
    )
    w = (
        Window.partitionBy("group")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # start materializes FIRST, then bin/offset/n_spans derive from the
    # column — one running-sum window expression instead of four
    # identical ones in the Window node
    pos = base.select(
        id_col,
        "n_tokens",
        "group",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start"),
    )
    return pos.select(
        id_col,
        "n_tokens",
        "group",
        "start",
        # integer DIV, not double /: the running token offset of a group
        # can exceed 2^53 at scale, where double division silently
        # misplaces bins and breaks the exact-integer oracle contract
        F.expr(f"start DIV {budget}").alias("bin"),
        (F.col("start") % budget).alias("offset"),
        # windows touched: ceil((offset + n_tokens) / budget) in pure
        # integer arithmetic, 0 if empty
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.expr(
                f"(start % {budget} + n_tokens + {budget - 1}) DIV {budget}"
            )
        )
        .cast("long")
        .alias("n_spans"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    include_text: bool = True,
) -> DataFrame:
    """Sliding-window document chunking — the retrieval/embedding-index
    sibling of :func:`pack_sequences`: each document is cut into
    windows of ``chunk_size`` whitespace tokens with ``overlap`` tokens
    shared between consecutive windows (stride = chunk_size - overlap),
    the standard RAG-corpus preparation.

    Returns (id_col, chunk_id, start, n_tokens[, chunk_text]) — chunk
    ``i`` covers tokens [i*stride, i*stride + n_tokens); the last
    chunk is short rather than padded, and a document shorter than one
    window yields exactly one chunk. n_chunks =
    1 + ceil(max(0, n - chunk_size) / stride), so every token is
    covered and no fully-redundant trailing window is emitted.

    Shape: one projection + explode over the token array — a single
    scan, no shuffle, no Python; all arithmetic integer so the driver
    gate hash-matches, and the chunk text itself is an exact
    ``array_join`` over the token slice (string-equal across engines).
    """
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must be in [0, chunk_size)")
    stride = chunk_size - overlap
    base = docs.select(
        F.col(id_col), F.split(F.col("text"), " ").alias("_toks")
    ).select(
        id_col, "_toks", F.size("_toks").cast("long").alias("_n")
    )
    chunks = base.select(
        id_col,
        "_toks",
        "_n",
        F.explode(
            F.expr(
                f"sequence(0, CASE WHEN _n <= {chunk_size} THEN 0"
                f" ELSE ((_n - {chunk_size}) + {stride} - 1) DIV {stride} END)"
            )
        ).alias("chunk_id"),
    ).select(
        id_col,
        "chunk_id",
        (F.col("chunk_id") * stride).alias("start"),
        F.least(F.lit(chunk_size), F.col("_n") - F.col("chunk_id") * stride)
        .cast("long")
        .alias("n_tokens"),
        "_toks",
    )
    if include_text:
        chunks = chunks.withColumn(
            "chunk_text",
            F.expr(f"array_join(slice(_toks, start + 1, n_tokens), ' ')"),
        )
    return chunks.drop("_toks")
