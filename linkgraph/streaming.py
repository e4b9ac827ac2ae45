"""Structured Streaming ingestion — beyond-reference capability.

The reference is batch-iterative only (SURVEY.md §3.8: no streaming),
but a 100 TB training-data corpus arrives incrementally; these wrappers
run the SAME stateless pipeline transforms (fingerprint, token count,
quality — plain column expressions, so they compose with streaming
DataFrames unchanged) over a file stream, plus a watermarked windowed
rollup for the events table. ``availableNow`` triggers give exactly-once
batch-equivalent runs (used by the tests to prove stream == batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-stream of a documents directory (schema inferred from the
    existing files once, driver-side)."""
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def document_stats_stream(docs: DataFrame) -> DataFrame:
    """Stateless per-document stats over a (streaming or batch) frame —
    the same expressions as the batch pipeline (textstats), one
    projection so no stream-stream join state is needed."""
    return docs.select(
        "doc_id",
        F.substring(F.md5(F.col("text")), 1, 16).alias("fingerprint"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


def events_hourly_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked hourly windowed counts per event type (late rows
    beyond the watermark are dropped deterministically)."""
    # watermarks require zoned TimestampType; parquet NTZ columns cast
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour"), "event_type", "n_events")
    )


def run_available_now(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    fmt: str = "parquet",
    output_mode: str = "append",
):
    """Process everything currently available, exactly once, then stop.
    Returns after the stream has drained."""
    q = (
        df.writeStream.trigger(availableNow=True)
        .outputMode(output_mode)
        .format(fmt)
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.awaitTermination()
    return q
