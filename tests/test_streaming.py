"""Structured Streaming ingestion: availableNow runs must equal the
batch answer over the same files (exactly-once, batch-equivalent)."""

from linkgraph.streaming import (
    document_stats_stream,
    events_hourly_stream,
    run_available_now,
    stream_documents,
    stream_events,
)

SF = "/root/testdata/sf0.001"


def _stage_dir(tmp_path, src, name):
    """File-stream sources read directories; stage the single test
    parquet file into one."""
    import shutil

    d = tmp_path / name
    d.mkdir()
    shutil.copy(src, d / "part-0.parquet")
    return str(d)


class TestStreaming:
    def test_document_stats_stream_equals_batch(self, spark, tmp_path):
        src = _stage_dir(tmp_path, f"{SF}/documents.parquet", "docs")
        stats = document_stats_stream(stream_documents(spark, src))
        out = str(tmp_path / "out")
        run_available_now(stats, out, str(tmp_path / "ck"))
        got = spark.read.parquet(out)
        batch = document_stats_stream(spark.read.parquet(f"{SF}/documents.parquet"))
        assert got.count() == batch.count() == 500
        diff = got.exceptAll(batch)
        assert diff.count() == 0

    def test_events_hourly_stream_counts(self, spark, tmp_path):
        src = _stage_dir(tmp_path, f"{SF}/events.parquet", "events")
        agg = events_hourly_stream(stream_events(spark, src))
        q = (
            agg.writeStream.trigger(availableNow=True)
            .outputMode("complete")
            .format("memory")
            .queryName("hourly")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
        )
        q.awaitTermination()
        got = spark.sql("SELECT SUM(n_events) AS n FROM hourly").first()["n"]
        # complete mode emits every window regardless of watermark; all
        # 1000 events land in some window
        assert got == 1000
        n_types = spark.sql("SELECT COUNT(DISTINCT event_type) AS n FROM hourly").first()["n"]
        assert n_types == 5
