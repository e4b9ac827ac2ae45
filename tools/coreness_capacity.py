"""Capacity probe for the h-index core-decomposition loop: one big
graph on one local[32] slice (48g heap, ParallelGC) — shows the
per-superstep throughput and that the fixpoint loop degrades smoothly
rather than OOMing, the same evidence shape as the 80M-vertex CC
capacity probe in BENCH/BASELINE.md.

Usage: python tools/coreness_capacity.py [n_vertices] [cores]
Writes BENCH/coreness_capacity.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from linkgraph import core_decomposition, get_spark
    from linkgraph.docgraph import scaled_edges

    heap_gb = max(3, int(cores * 1.5))
    spark = get_spark(
        app_name="linkgraph-coreness-capacity",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.memory": f"{heap_gb}g",
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={cores}"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    edges = scaled_edges(spark, n, num_partitions=2 * cores).persist()
    n_edges = edges.count()
    build_sec = time.monotonic() - t0

    t1 = time.monotonic()
    out, res = core_decomposition(
        edges, vertices=spark.range(n).select(F.col("id")), max_iters=64
    )
    row = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("coreness").alias("checksum"),
        F.max("coreness").alias("max_core"),
    ).first()
    total_sec = time.monotonic() - t1
    spark.stop()

    steps = [round(h.wall_sec, 3) for h in res.history]
    result = {
        "workload": "core_decomposition (h-index fixpoint)",
        "cores": cores,
        "heap_gb": heap_gb,
        "n_vertices": n,
        "n_edges": n_edges,
        "supersteps": res.supersteps,
        "converged": res.converged,
        "per_step_sec": steps,
        "total_sec": round(total_sec, 3),
        "build_sec": round(build_sec, 3),
        # per superstep, every directed edge carries one message
        "edges_per_sec_per_superstep": round(
            2 * n_edges * res.supersteps / sum(steps), 1
        ),
        "coreness_checksum": int(row["checksum"]),
        "max_coreness": int(row["max_core"]),
    }
    (ROOT / "BENCH" / "coreness_capacity.json").write_text(
        json.dumps(result, indent=1)
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
