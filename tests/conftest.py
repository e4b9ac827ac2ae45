import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from linkgraph import get_spark

    # one JVM hosts the whole suite (117+ tests, thousands of superstep
    # executions) — Spark's 1g driver default is marginal for that
    s = get_spark(
        app_name="linkgraph-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def webmap_edges(spark):
    from linkgraph.synth import WEBMAP, adjacency_to_edges, edges_df

    return edges_df(spark, adjacency_to_edges(WEBMAP)).cache()


@pytest.fixture(scope="session")
def clique_edges(spark):
    from linkgraph.synth import CLIQUE, adjacency_to_edges, edges_df

    return edges_df(spark, adjacency_to_edges(CLIQUE)).cache()
