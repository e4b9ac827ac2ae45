"""Derive the link graph from the source-code table.

Reference analogue: the AsterixDB external connector's record->vertex
conversion (external-connector-asterixdb ReadConnector /
VertexInputConverter, see /root/reference pregelix-api
converter/VertexInputConverter.java and JobGen.java:606-688). There, an
AsterixDB dataset of records becomes the vertex relation; here, an
Iceberg/parquet table of source files ``(repo, path, commit, lang,
content)`` becomes ``vertices(id, repo, path, sha256)`` and
``edges(src, dst)``.

Edge rule (north_star): vertices are files (or repos), edges come from
cross-repo ``import <repo>/<path>`` references found in ``content``.
Everything is built-in Spark SQL expressions — regexp extraction,
explode, hash — so Catalyst prunes ``content`` out of downstream plans
and the whole derivation is JVM-side (no Python in the hot path).

Vertex ids: ``xxhash64(repo, '/', path)`` — deterministic, computable
per-row with no global sort, which is what survives at 10^12 files
(a dense-rank id would need a total ordering / windowed shuffle over
the full table). Collision note: 64-bit ids give ~3% birthday collision
odds at 10^12 keys; ``id_mode="dense"`` exists for exact small-scale
work and tests.

The per-row invariant required by BASELINE.json: ``sha256 =
F.sha2(content, 256)`` is computed once here and carried on the
vertices table so tests can assert it never changes downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

IMPORT_RE = r"import ([A-Za-z0-9_./-]+)"


def derive_files(code_files: DataFrame, id_mode: str = "hash") -> DataFrame:
    """code_files -> one row per file with stable id + sha256(content).

    ``id_mode="hash"``: xxhash64 of the fully-qualified name (scales,
    no shuffle). ``id_mode="dense"``: 0..V-1 dense ids via a global
    ordering (small-scale / exact-fixture use only).
    """
    files = code_files.withColumn("fqn", F.concat_ws("/", "repo", "path")).withColumn(
        "sha256", F.sha2(F.col("content"), 256)
    )
    if id_mode == "hash":
        files = files.withColumn("id", F.xxhash64("fqn"))
    elif id_mode == "dense":
        w = Window.orderBy("fqn")
        files = files.withColumn("id", F.row_number().over(w).cast("long") - F.lit(1))
    else:
        raise ValueError(f"unknown id_mode {id_mode!r}")
    return files


def derive_edges(files: DataFrame, dedup: bool = True) -> DataFrame:
    """Extract ``import <repo>/<path>`` references -> edges(src, dst).

    The reference target must exist as a file (inner join on fqn), and
    self-loops from a file importing itself are dropped. Returns
    ``(src BIGINT, dst BIGINT)``.
    """
    refs = (
        files.select(
            F.col("id").alias("src"),
            F.explode(F.expr(f"regexp_extract_all(content, '{IMPORT_RE}', 1)")).alias(
                "ref_fqn"
            ),
        )
    )
    targets = files.select(F.col("fqn").alias("ref_fqn"), F.col("id").alias("dst"))
    edges = refs.join(targets, "ref_fqn").select("src", "dst").filter("src != dst")
    if dedup:
        edges = edges.distinct()
    return edges


def derive_graph(code_files: DataFrame, id_mode: str = "hash") -> tuple[DataFrame, DataFrame]:
    """Convenience: (vertices, edges) from the raw code_files table.

    vertices = (id, repo, path, sha256); edges = (src, dst) deduped.
    """
    files = derive_files(code_files, id_mode=id_mode)
    vertices = files.select("id", "repo", "path", "sha256")
    edges = derive_edges(files)
    return vertices, edges


def derive_repo_graph(code_files: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Repo-granularity rollup of the link graph (the north_star's other
    vertex granularity: "vertices are repos/files").

    Returns ``(vertices(id, repo, n_files), edges(src, dst, weight))``
    where ``weight`` counts the distinct file-level import references
    crossing the repo pair — i.e. the file graph aggregated by repo, so
    a repo pair linked by many files outweighs one linked by a single
    import. Intra-repo references are dropped (they are not edges at
    repo granularity). Repo ids are ``xxhash64(repo)`` — per-row
    computable, same scale rationale as file ids.

    Execution shape: the same regexp scatter + fqn equi-join as
    :func:`derive_edges`, then ONE aggregation keyed by the repo pair.
    At 10^12 files the repo graph is many orders smaller than the file
    graph, so this is the standard first step before whole-corpus
    analytics (rank repos, not files).
    """
    files = derive_files(code_files, id_mode="hash")
    refs = files.select(
        F.col("repo").alias("src_repo"),
        F.col("id").alias("src_file"),
        F.explode(F.expr(f"regexp_extract_all(content, '{IMPORT_RE}', 1)")).alias(
            "ref_fqn"
        ),
    ).distinct()
    targets = files.select(
        F.col("fqn").alias("ref_fqn"), F.col("repo").alias("dst_repo")
    ).distinct()
    repo_edges = (
        refs.join(targets, "ref_fqn")
        .filter(F.col("src_repo") != F.col("dst_repo"))
        .groupBy("src_repo", "dst_repo")
        .agg(F.count(F.lit(1)).alias("weight"))
        .select(
            F.xxhash64("src_repo").alias("src"),
            F.xxhash64("dst_repo").alias("dst"),
            F.col("weight").cast("long").alias("weight"),
        )
    )
    repo_vertices = files.groupBy("repo").agg(
        F.count(F.lit(1)).alias("n_files")
    ).select(F.xxhash64("repo").alias("id"), "repo", "n_files")
    return repo_vertices, repo_edges
