"""Phase-timed profile of the MinHash-LSH dedup pipeline at one
local[k] level. Diagnostic companion to tools/_dedup_scaling_run.py —
same corpus, same resource model, but materializes each phase
separately so the non-scaling stage is visible.

Usage: python tools/_dedup_profile.py <cores> <n_docs>
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VOCAB = 50_000
TOKENS = 60
CHANGED_TAIL = 3


def cpu_sampler(stop, samples):
    """Sample system-wide CPU busy fraction from /proc/stat."""

    def read():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + vals[4]
        return sum(vals), idle

    prev_total, prev_idle = read()
    while not stop.wait(1.0):
        total, idle = read()
        dt, di = total - prev_total, idle - prev_idle
        prev_total, prev_idle = total, idle
        if dt > 0:
            samples.append(1.0 - di / dt)


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    shuffle = 2 * cores

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.pipeline import dedup as dd

    heap_gb = max(3, int(cores * 1.5))
    gc_name = os.environ.get("LINKGRAPH_GC", "parallel").lower()
    if gc_name == "g1":
        gc_opts = f"-XX:+UseG1GC -XX:ParallelGCThreads={max(2, cores)}"
    else:
        gc_opts = f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cores)}"
    spark = get_spark(
        app_name=f"dedup-profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.driver.memory": f"{heap_gb}g",
            "spark.driver.extraJavaOptions": gc_opts,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

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
            F.expr("CASE WHEN id % 10 = 9 THEN id - 9 ELSE id END").alias("base"),
            F.expr("id % 10 = 9").alias("tweak"),
            F.col("id"),
        )
        .select("doc_id", F.expr(text).alias("text"))
        .persist()
    )
    docs.count()

    phases = {}
    stop = threading.Event()
    samples: list[float] = []
    t = threading.Thread(target=cpu_sampler, args=(stop, samples), daemon=True)
    t.start()

    num_hashes, bands, shingle_n, seed = 64, 16, 3, 42
    rows_per_band = num_hashes // bands

    t0 = time.monotonic()
    sigs = dd.minhash_signatures(docs, num_hashes, shingle_n, seed, portable=False).persist()
    sigs.count()
    phases["signatures"] = round(time.monotonic() - t0, 2)
    cpu_sig = sum(samples) / max(len(samples), 1)
    samples.clear()

    band_key = "xxhash64(concat_ws(',', slice(sig, bd*{r}+1, {r})))".format(r=rows_per_band)
    t0 = time.monotonic()
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" bd -> struct(bd AS band, {band_key} AS bucket))"
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    banded = dd.cap_buckets(banded, ["band", "bucket"], 100_000).persist()
    banded.count()
    phases["banding_cap"] = round(time.monotonic() - t0, 2)
    cpu_band = sum(samples) / max(len(samples), 1)
    samples.clear()

    t0 = time.monotonic()
    left = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cands = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .persist()
    )
    cands.count()
    phases["bucket_join"] = round(time.monotonic() - t0, 2)
    cpu_join = sum(samples) / max(len(samples), 1)
    samples.clear()

    t0 = time.monotonic()
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),"
        " 0, (acc, v) -> acc + v)"
    ) / F.lit(float(num_hashes))
    pairs = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= 0.4)
        .select("doc_a", "doc_b", "est_jaccard")
    )
    n_pairs = pairs.count()
    phases["verify_join"] = round(time.monotonic() - t0, 2)
    cpu_ver = sum(samples) / max(len(samples), 1)
    stop.set()

    out = {
        "cores": cores,
        "gc": gc_name,
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "phases": phases,
        "total": round(sum(phases.values()), 2),
        "cpu_busy": {
            "signatures": round(cpu_sig, 3),
            "banding_cap": round(cpu_band, 3),
            "bucket_join": round(cpu_join, 3),
            "verify_join": round(cpu_ver, 3),
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
