"""Sources and sinks beyond parquet/Iceberg tables — the reference's
text I/O formats re-expressed as DataFrame readers/writers.

Reference analogues (SURVEY.md §3.1):

- ``adjacency_text_graph``: TextVertexInputFormat / the
  TextPageRankInputFormat tokenizer — one line per vertex,
  whitespace-separated ``src dst1 dst2 ...`` (the webmap/clique fixture
  format, TextPageRankInputFormat.java:47-96). A line with only an id
  is an isolated vertex.
- ``ring_graph``: GeneratedVertexInputFormat / GeneratedVertexReader —
  the synthetic ring used by the reference's generated tests
  (PageRankVertex.java:150-196: vertex i has one out-edge to
  (i+1) % n).
- ``write_vertex_text``: TextVertexOutputFormat — ``id <TAB> value``
  lines (PageRankVertex.java:201-232); the reference external-sorts
  before the final write (JobGen.java:719-728), ``sort=True``
  reproduces that for golden comparisons (single file at small scale;
  at scale leave unsorted and partitioned).

Everything is JVM-side column expressions — the text parse is
split/slice/transform, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def adjacency_text_graph(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read ``src dst1 dst2 ...`` text into (vertices DF(id), edges
    DF(src, dst)). Duplicate edges in a line are preserved (the
    reference's MsgList semantics count them once per occurrence only
    in no-combiner mode; algorithms dedupe as needed)."""
    lines = (
        spark.read.text(path)
        .select(F.split(F.trim(F.col("value")), r"\s+").alias("toks"))
        .filter(F.size("toks") >= 1)
        .filter(F.col("toks")[0] != "")
    )
    parsed = lines.select(
        F.col("toks")[0].cast("long").alias("src"),
        F.expr("transform(slice(toks, 2, size(toks) - 1), t -> CAST(t AS LONG))").alias("dsts"),
    )
    vertices = parsed.select(F.col("src").alias("id"))
    edges = parsed.select("src", F.explode("dsts").alias("dst"))
    return vertices, edges


def ring_graph(spark: SparkSession, n: int) -> DataFrame:
    """edges DF(src, dst): vertex i -> (i+1) % n (the reference's
    generated test graph)."""
    return spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )


def write_vertex_text(
    df: DataFrame, path: str, value_col: str | None = None, sort: bool = False
) -> None:
    """Write ``id <TAB> value`` text lines (TextVertexOutputFormat)."""
    if value_col is None:
        value_col = [c for c in df.columns if c != "id"][0]
    out = df.select(
        F.concat_ws("\t", F.col("id").cast("string"), F.col(value_col).cast("string")).alias(
            "value"
        )
    )
    if sort:
        out = df.orderBy("id").select(
            F.concat_ws(
                "\t", F.col("id").cast("string"), F.col(value_col).cast("string")
            ).alias("value")
        ).coalesce(1)
    out.write.mode("overwrite").text(path)
