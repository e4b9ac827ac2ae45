"""Print (and optionally save) the physical plan of one PageRank
superstep — the evidence that the loop is one-exchange-per-superstep:

- adjacency side: InMemoryTableScan, NO Exchange above it (cached with
  hashpartitioning(src, p) preserved);
- state side: Scan ExistingRDD (localCheckpoint) with its
  hashpartitioning(id, p) intact, NO Exchange;
- exactly one Exchange in the plan: the message-combine shuffle between
  partial and final HashAggregate.

Usage: python tools/explain_superstep.py [n_vertices] [> BENCH/EXPLAIN.md]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.docgraph import scaled_edges
    from linkgraph.partitioning import build_adjacency
    from linkgraph.superstep import iteration_conf

    spark = get_spark(master="local[2]", shuffle_partitions=8, app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    p = 8

    with iteration_conf(spark, p):
        edges = scaled_edges(spark, n)
        adj = build_adjacency(edges, num_partitions=p).persist()
        adj.count()
        ranks = (
            spark.range(n)
            .select("id", F.lit(1.0 / n).alias("rank"))
            .repartition(p, "id")
            .localCheckpoint(eager=True)
        )
        msgs = (
            adj.join(ranks, adj["src"] == ranks["id"])
            .select(F.explode("dsts").alias("id"), (F.col("rank") / F.col("outdeg")).alias("w"))
            .groupBy("id")
            .agg(F.sum("w").alias("msum"))
        )
        new = (
            ranks.withColumnRenamed("rank", "_old")
            .join(msgs, "id", "left_outer")
            .select(
                "id",
                (F.lit(0.15 / n) + F.lit(0.85) * F.coalesce(F.col("msum"), F.lit(0.0))).alias("rank"),
            )
        )
        plan = new._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    print("# Per-superstep physical plan (PageRank)")
    print()
    print("How to read: the `InMemoryRelation` block is the cached adjacency's")
    print("ONE-TIME build plan (its internal Exchanges executed once, before the")
    print("loop). The executed per-superstep tree is everything outside it:")
    print("`Scan ExistingRDD` (the localCheckpoint'ed rank state) reports its")
    print("preserved `hashpartitioning(id, p)` so the outer join needs no")
    print("exchange, and the only shuffle `Exchange` is the message combine")
    print("between partial and final HashAggregate — the reference's")
    print("local-combine -> MToN -> final-combine (JobGen.java:1124-1215). At toy")
    print("sizes Spark additionally broadcasts the small rank side into the")
    print("adjacency join (BroadcastExchange); at scale that join is a")
    print("co-partitioned zip with no exchange.")
    print()
    print("```")
    print(plan)
    print("```")
    spark.stop()


if __name__ == "__main__":
    main()
