"""Signatures-phase-only probe: time minhash_signatures at one
local[k] level and account CPU seconds by process type (java vs
pyspark workers) over the timed region.

Usage: python tools/_dedup_sig_probe.py <cores> <n_docs>
Env: LINKGRAPH_GC=parallel|g1, LINKGRAPH_BATCH=<arrow batch rows>
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
CHANGED_TAIL = 3


def proc_cpu_by_kind() -> dict:
    """Sum utime+stime (seconds) for java and python procs."""
    hz = os.sysconf("SC_CLK_TCK")
    out = {"java": 0.0, "python": 0.0, "sys_java": 0.0, "sys_python": 0.0}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            with open(f"/proc/{pid}/comm") as f:
                comm = f.read().strip()
        except OSError:
            continue
        utime, stime = int(parts[11]) / hz, int(parts[12]) / hz
        if "java" in comm:
            out["java"] += utime + stime
            out["sys_java"] += stime
        elif "python" in comm:
            out["python"] += utime + stime
            out["sys_python"] += stime
    return out


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    shuffle = 2 * cores

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.pipeline.dedup import minhash_signatures

    heap_gb = max(3, int(cores * 1.5))
    gc_name = os.environ.get("LINKGRAPH_GC", "parallel").lower()
    if gc_name == "g1":
        gc_opts = f"-XX:+UseG1GC -XX:ParallelGCThreads={max(2, cores)}"
    else:
        gc_opts = f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cores)}"
    if os.environ.get("LINKGRAPH_PRETOUCH"):
        gc_opts += f" -Xms{heap_gb}g -XX:+AlwaysPreTouch"
    if os.environ.get("LINKGRAPH_MALLOC"):
        os.environ["MALLOC_MMAP_THRESHOLD_"] = "1073741824"
        os.environ["MALLOC_TRIM_THRESHOLD_"] = "1073741824"
        os.environ["ARROW_DEFAULT_MEMORY_POOL"] = "system"
    extra = {
        "spark.driver.memory": f"{heap_gb}g",
        "spark.driver.extraJavaOptions": gc_opts,
    }
    batch = os.environ.get("LINKGRAPH_BATCH")
    if batch:
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = batch
    spark = get_spark(
        app_name=f"dedup-sig-probe-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
        extra_conf=extra,
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

    before = proc_cpu_by_kind()
    t0 = time.monotonic()
    sigs = minhash_signatures(docs, 64, 3, 42, portable=False)
    n = sigs.write.format("noop").mode("overwrite").save() or n_docs
    wall = time.monotonic() - t0
    after = proc_cpu_by_kind()

    out = {
        "cores": cores,
        "gc": gc_name,
        "batch": batch or "default",
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "java_cpu_sec": round(after["java"] - before["java"], 1),
        "python_cpu_sec": round(after["python"] - before["python"], 1),
        "java_sys_sec": round(after["sys_java"] - before["sys_java"], 1),
        "python_sys_sec": round(after["sys_python"] - before["sys_python"], 1),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
