"""One dedup-scaling worker: MinHash-LSH near-dup pair generation over a
synthetic documents table at a given local[k] master. Prints one JSON
line.

Usage: python tools/_dedup_scaling_run.py <cores> <n_docs> [shuffle_partitions]

Same fixed-per-core resource model as tools/_scaling_run.py (heap and GC
threads proportional to cores — the cluster-faithful stand-in for N vs
4N executors). The corpus is synthesized fully distributed from
spark.range (no driver-side data): 60 tokens/doc over a 50k vocabulary;
every 10th doc is a near-dup of its block leader with the last 3 tokens
rewritten (~0.84 shingle Jaccard — solidly above the 0.4 threshold), so
the run discovers n/10 true near-dup pairs. The pair count doubles as
the same-answer checksum across parallelism levels.

Timed region = the full dedup pipeline (shingle -> signature -> band ->
bucket join -> verify), production hash mode (portable=False, xxhash64).
Synthesis is materialized (persist + count) before the clock starts.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VOCAB = 50_000
TOKENS = 60
CHANGED_TAIL = 3  # tokens rewritten in each near-dup


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else 2 * cores

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.pipeline.dedup import minhash_lsh_pairs

    heap_gb = max(3, int(cores * 1.5))
    gc_name = os.environ.get("LINKGRAPH_GC", "parallel").lower()
    if gc_name == "g1":
        gc_opts = f"-XX:+UseG1GC -XX:ParallelGCThreads={max(2, cores)}"
    else:
        gc_name = "parallel"
        gc_opts = f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cores)}"
    # Fixed, pre-touched heap — cluster-faithful (Spark executors run
    # with -Xms = -Xmx) and essential here: with the default tiny -Xms,
    # the JVM's commit/uncommit dance under a churny allocation profile
    # put ~1000 CPU-seconds of page-fault system time into a 2M-doc run
    # at 32 cores (measured via tools/_dedup_sig_probe.py), serializing
    # the whole box in the kernel page allocator.
    gc_opts += f" -Xms{heap_gb}g -XX:+AlwaysPreTouch"
    spark = get_spark(
        app_name=f"linkgraph-dedup-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.driver.memory": f"{heap_gb}g",
            "spark.driver.extraJavaOptions": gc_opts,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # doc i: tokens j=0..59; block leader b = i - i%10; doc with i%10==9
    # copies leader tokens except the last 3, which hash in its own id.
    # Tokens are xxhash64-draws per (base, j) — NOT an arithmetic
    # progression, which would alias shifted shingle windows across
    # blocks and explode the true pair count
    text = (
        "concat_ws(' ', transform(sequence(0, {T} - 1), j -> concat('t', "
        " pmod(xxhash64(concat(CASE WHEN tweak AND j >= {T} - {C}"
        "   THEN concat('x', id) ELSE concat('b', base) END, '_', j)), {V}))))"
    ).format(T=TOKENS, C=CHANGED_TAIL, V=VOCAB)
    docs = (
        spark.range(n_docs)
        .repartition(shuffle)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"CASE WHEN id % 10 = 9 THEN id - 9 ELSE id END"
            ).alias("base"),
            F.expr("id % 10 = 9").alias("tweak"),
            F.col("id"),
        )
        .select("doc_id", F.expr(text).alias("text"))
        .persist()
    )
    n = docs.count()

    t0 = time.monotonic()
    pairs = minhash_lsh_pairs(docs, threshold=0.4, portable=False)
    n_pairs = pairs.count()
    wall = time.monotonic() - t0

    out = {
        "cores": cores,
        "shuffle_partitions": shuffle,
        "heap_gb": heap_gb,
        "gc": gc_name,
        "n_docs": n,
        "n_pairs": n_pairs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n / wall, 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
