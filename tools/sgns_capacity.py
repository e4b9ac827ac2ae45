"""Capacity probe for the model-sharded SGNS trainer (VERDICT r3 item
#2 done-criterion): train on a vocabulary far beyond the driver-held
variant's cap with ZERO driver-side model state — the embedding
relation stays a vertex-keyed DataFrame end to end.

The pair corpus is synthesized distributed (spark.range arithmetic, no
driver data); vocabulary = all n vertices. The driver-held train_sgns
would materialize two n x dim int64 matrices on the driver (at 10M x 8
that is 1.3 GB of ndarray, broadcast per epoch); train_sgns_sharded
runs the same exact-integer updates as keyed exchanges.

Usage: python tools/sgns_capacity.py [n_vocab] [n_pairs] [cores] [dim] [epochs]
Writes BENCH/sgns_capacity.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    epochs = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.pipeline.sgns import train_sgns_sharded

    heap_gb = max(3, int(cores * 1.5))
    spark = get_spark(
        app_name="linkgraph-sgns-capacity",
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

    # distributed synthetic skip-gram pairs over the full n-vocab
    pairs = (
        spark.range(n_pairs)
        .select(
            (F.col("id") % n).alias("center"),
            ((F.col("id") * 31 + 7) % n).alias("context"),
            (F.col("id") % 3 + 1).alias("n_pairs"),
        )
        .filter(F.col("center") != F.col("context"))
    )
    vertices = spark.range(n).select(F.col("id"))

    t0 = time.monotonic()
    emb = train_sgns_sharded(
        pairs,
        vertices=vertices,
        dim=dim,
        epochs=epochs,
        negatives=1,
        num_partitions=2 * cores,
    )
    row = emb.agg(
        F.count(F.lit(1)).alias("rows"), F.sum("value").alias("chk")
    ).first()
    total_sec = time.monotonic() - t0
    spark.stop()

    result = {
        "workload": "train_sgns_sharded (model kept as vertex-keyed DataFrame)",
        "cores": cores,
        "heap_gb": heap_gb,
        "n_vocab": n,
        "n_pairs": n_pairs,
        "dim": dim,
        "epochs": epochs,
        "total_sec": round(total_sec, 3),
        "embedding_rows": int(row["rows"]),
        "value_checksum": int(row["chk"]),
        "driver_model_bytes": 0,
        "driver_held_variant_would_need_bytes": 2 * n * dim * 8,
    }
    (ROOT / "BENCH" / "sgns_capacity.json").write_text(
        json.dumps(result, indent=1)
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
