"""Capacity probes for the round-3 heavyweight graph operators
(VERDICT r3 item #5): SCC (FW-BW rounds), minimum spanning forest
(Boruvka + anchored pointer doubling), and Louvain-multilevel — each on
a >= 5M-vertex graph at one local[32] slice, recording ROUNDS together
with wall time so the O(log)-round claims get a measured data point
(the WL/coreness probe pattern, BENCH/wl_capacity.json).

Usage: python tools/heavy_capacity.py [n_vertices] [cores] [op ...]
       ops default to: scc msf louvain
Writes/merges BENCH/heavy_capacity.json (one entry per (op, size) —
repeat at two sizes to show the O(log) round growth).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ops = sys.argv[3:] or ["scc", "msf", "louvain"]

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.docgraph import scaled_edges

    heap_gb = max(3, int(cores * 1.5))
    spark = get_spark(
        app_name="linkgraph-heavy-capacity",
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

    out_path = ROOT / "BENCH" / "heavy_capacity.json"
    results = (
        json.loads(out_path.read_text()) if out_path.exists() else {}
    )
    common = {
        "cores": cores,
        "heap_gb": heap_gb,
        "n_vertices": n,
        "n_edges": n_edges,
        "build_sec": round(build_sec, 3),
    }

    if "scc" in ops:
        from linkgraph.algorithms.scc import strongly_connected_components

        t1 = time.monotonic()
        out, res = strongly_connected_components(
            edges, vertices=spark.range(n).select(F.col("id"))
        )
        row = out.agg(
            F.count(F.lit(1)).alias("rows"), F.sum("scc").alias("chk")
        ).first()
        results[f"scc_{n}"] = {
            **common,
            "workload": "strongly_connected_components (FW-BW rounds)",
            "rounds_supersteps_total": res.supersteps,
            "converged": res.converged,
            "total_sec": round(time.monotonic() - t1, 3),
            "rows": int(row["rows"]),
            "scc_checksum": int(row["chk"]),
        }
        print("scc:", json.dumps(results[f"scc_{n}"]))

    if "msf" in ops:
        from linkgraph.algorithms.msf import minimum_spanning_forest

        t1 = time.monotonic()
        forest, rounds = minimum_spanning_forest(edges)
        row = forest.agg(
            F.count(F.lit(1)).alias("rows"), F.sum("weight").alias("chk")
        ).first()
        results[f"msf_{n}"] = {
            **common,
            "workload": "minimum_spanning_forest (Boruvka rounds, anchored pointer doubling)",
            "boruvka_rounds": rounds,
            "total_sec": round(time.monotonic() - t1, 3),
            "forest_edges": int(row["rows"]),
            "weight_checksum": int(row["chk"]),
        }
        print("msf:", json.dumps(results[f"msf_{n}"]))

    if "louvain" in ops:
        from linkgraph.algorithms.louvain import louvain_multilevel

        t1 = time.monotonic()
        lab = louvain_multilevel(edges, levels=2, rounds=2)
        row = lab.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("community").alias("n_comm"),
            F.sum("community").alias("chk"),
        ).first()
        results[f"louvain_{n}"] = {
            **common,
            "workload": "louvain_multilevel (2 levels x 2 move rounds + contraction)",
            "levels": 2,
            "move_rounds_per_level": 2,
            "total_sec": round(time.monotonic() - t1, 3),
            "rows": int(row["rows"]),
            "n_communities": int(row["n_comm"]),
            "community_checksum": int(row["chk"]),
        }
        print("louvain:", json.dumps(results[f"louvain_{n}"]))

    spark.stop()
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
