"""One walks-scaling worker: production-mode random walks on the
scaled arithmetic graph at a given local[k] master. Prints one JSON
line.

Usage: python tools/_walks_scaling_run.py <cores> <n_vertices> <walk_length> [shuffle_partitions] [warmup]

Timed region = the superstep loop only (the indexed-edge build is the
one-time graph-load cost, as in the PageRank ladder). The per-step
frontier is ~n_vertices walkers throughout (the arithmetic graph has
almost no dead ends), so steps are comparable across levels and the
steady median step time is the right pairing. Same-answer checksum:
sum over the corpus of vertex*(step+1), identical at every parallelism
level because the walk is a pure function of (graph, seed).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    cores = int(sys.argv[1])
    n = int(sys.argv[2])
    walk_length = int(sys.argv[3])
    shuffle = int(sys.argv[4]) if len(sys.argv) > 4 else 2 * cores
    warmup = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.algorithms.walks import random_walks
    from linkgraph.docgraph import scaled_edges

    # fixed per-core resources — see tools/_scaling_run.py's rationale
    heap_gb = max(3, int(cores * 1.5))
    gc_name = os.environ.get("LINKGRAPH_GC", "parallel").lower()
    if gc_name == "g1":
        gc_opts = f"-XX:+UseG1GC -XX:ParallelGCThreads={max(2, cores)}"
    else:
        gc_name = "parallel"
        gc_opts = f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cores)}"
    spark = get_spark(
        app_name=f"linkgraph-walks-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.driver.memory": f"{heap_gb}g",
            "spark.driver.extraJavaOptions": gc_opts,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    t_build0 = time.monotonic()
    edges = scaled_edges(spark, n, num_partitions=shuffle).persist()
    n_edges = edges.count()
    build_sec = time.monotonic() - t_build0

    def cpu_snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:9]))

    from pyspark.storagelevel import StorageLevel

    cpu0 = cpu_snap()
    t0 = time.monotonic()
    # DISK_ONLY retained frames: at ladder sizes walkers x steps
    # outgrows the block-manager LRU and MEMORY_AND_DISK eviction
    # churn makes per-step times bimodal (9-52s swings measured at
    # 40M x 16); steady disk writes keep steps comparable
    corpus, res = random_walks(
        edges,
        walks_per_vertex=1,
        walk_length=walk_length,
        vertices=spark.range(n).select(F.col("id")),
        num_partitions=shuffle,
        frame_storage=StorageLevel.DISK_ONLY,
    )
    row = corpus.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("vertex") * (F.col("step") + 1)).alias("chk"),
    ).first()
    total_sec = time.monotonic() - t0
    cpu1 = cpu_snap()
    cpu_d = [b - a for a, b in zip(cpu0, cpu1)]
    # /proc/stat: user nice system idle iowait irq softirq STEAL —
    # hypervisor-stolen cycles during the timed region; this box shows
    # bursty 10-25% steal under 32-thread load, so every level records
    # the interference it actually ran under
    steal_pct = round(100.0 * cpu_d[7] / max(1, sum(cpu_d)), 1)
    loop_sec = sum(h.wall_sec for h in res.history)
    spark.stop()

    steps = [h.wall_sec for h in res.history]
    steady = sorted(steps[warmup:]) if len(steps) > warmup else sorted(steps)
    steady_median = steady[len(steady) // 2]
    print(
        json.dumps(
            {
                "cores": cores,
                "shuffle_partitions": shuffle,
                "n_vertices": n,
                "n_edges": n_edges,
                "walk_length": walk_length,
                "warmup_steps_excluded": warmup if len(steps) > warmup else 0,
                "heap_gb": heap_gb,
                "gc": gc_name,
                "steal_pct": steal_pct,
                "build_sec": round(build_sec, 3),
                "total_sec": round(total_sec, 3),
                "loop_sec": round(loop_sec, 3),
                "per_step_sec": [round(s, 3) for s in steps],
                "steady_median_step_sec": round(steady_median, 3),
                "walker_steps_per_sec": round(n / steady_median, 1),
                "corpus_rows": int(row["rows"]),
                "corpus_checksum": int(row["chk"]),
            }
        )
    )


if __name__ == "__main__":
    main()
