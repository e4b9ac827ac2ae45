"""Deterministic edge graph over the driver's ``documents`` table.

The driver's correctness gate runs each Spark query against a DuckDB
oracle on the same parquet tables, so the graph the oracle sees must be
derivable by BOTH engines with bit-identical results. The real
code-import derivation (derive.py) is regex+join over synthesized
content; for the oracle gate we instead derive edges from ``documents``
by a pure-arithmetic rule (integer ops evaluate identically in Spark and
DuckDB):

    N       = count(documents)
    deg(d)  = 1 + (d % 7) + (30 if d % 101 == 0 else 0)   # hubs every 101
    dst_j   = (d*31 + 97*j*j + j) % N   for j in 1..deg(d)
    edges   = distinct (d, dst_j) with self-loops removed

Power-law-ish enough to exercise hubs, fully deterministic, no data
movement beyond the documents scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def document_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir).select(F.col("doc_id").alias("id"))


def arithmetic_edges(ids: DataFrame, n: int) -> DataFrame:
    """Apply the arithmetic edge rule to DF(src BIGINT) with modulus n.

    Shared by the oracle-checkable documents graph below and the
    at-scale benchmark graph (``scaled_edges``)."""
    deg = ids.select(
        "src",
        (
            F.lit(1)
            + F.col("src") % 7
            + F.when(F.col("src") % 101 == 0, F.lit(30)).otherwise(F.lit(0))
        ).cast("long").alias("k"),
    )
    return (
        deg.select("src", F.explode(F.expr("sequence(1, k)")).alias("j"))
        .select(
            "src",
            ((F.col("src") * 31 + 97 * F.col("j") * F.col("j") + F.col("j")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def document_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges(src BIGINT, dst BIGINT) via the arithmetic rule above."""
    docs = load_documents(spark, sf_dir)
    n = docs.count()
    return arithmetic_edges(docs.select(F.col("doc_id").alias("src")), n)


def scaled_edges(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """The same graph shape at arbitrary vertex count ``n`` generated
    from ``spark.range`` — fully distributed synthesis (no driver-side
    data), used by the throughput/scaling benchmarks."""
    ids = spark.range(n).select(F.col("id").alias("src"))
    if num_partitions:
        ids = ids.repartition(num_partitions)
    return arithmetic_edges(ids, n)


# ---- DuckDB-dialect SQL building blocks for the oracle side ----------

EDGES_CTES = """
deg AS (
  SELECT doc_id AS src,
         CAST(1 + (doc_id % 7) + CASE WHEN doc_id % 101 = 0 THEN 30 ELSE 0 END AS BIGINT) AS k
  FROM documents
),
er AS (
  SELECT src, unnest(generate_series(1, k)) AS j FROM deg
),
edges AS (
  SELECT DISTINCT src,
         (src*31 + 97*j*j + j) % (SELECT COUNT(*) FROM documents) AS dst
  FROM er
  WHERE (src*31 + 97*j*j + j) % (SELECT COUNT(*) FROM documents) != src
)
"""

SYM_CTE = """
sym AS (
  SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges
)
"""
