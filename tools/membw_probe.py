"""Box memory-bandwidth saturation curve — the measured decomposition
behind the single-box scaling ceiling.

A PageRank superstep is memory-bandwidth-bound: the scatter streams the
cached adjacency, the combine streams message pairs through the shuffle,
and the join streams the vertex state — all sequential passes over
hundreds of MB per task with trivial arithmetic per byte. On a REAL
N -> 4N executor scale-out, every executor brings its own DRAM channels,
so aggregate bandwidth grows 4x with the cores. In this sandbox all
"executors" are threads of one JVM on one box sharing one memory
controller — so the honest question for the local[8] -> local[32] pair
is: does THIS BOX deliver 4x the bandwidth to 32 workers that it
delivers to 8?

This probe answers that independently of Spark: P worker processes each
run a STREAM-triad-like kernel (a = b + s*c over arrays far larger than
LLC) for a fixed duration; aggregate GB/s per process count is the
box's saturation curve. Each element moves 24 bytes per pass (read b,
read c, write a — write-allocate traffic not counted, so the numbers
are conservative).

Usage: python tools/membw_probe.py [--procs 1,2,4,8,16,32]
       [--mb 256] [--seconds 8]
Writes BENCH/membw.json; bench_scaling.py embeds it into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time
from datetime import date
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _worker(mb: int, seconds: float, start_evt, out_q) -> None:
    n = mb * 1024 * 1024 // 8
    rng = np.random.default_rng(0)
    a = np.empty(n)
    b = rng.random(n)
    c = rng.random(n)
    s = 1.000001
    # touch everything once (page-in) before the timed window
    np.add(b, c, out=a)
    start_evt.wait()
    t0 = time.monotonic()
    passes = 0
    while time.monotonic() - t0 < seconds:
        np.multiply(c, s, out=a)
        np.add(a, b, out=a)
        passes += 1
    elapsed = time.monotonic() - t0
    # per pass: read c + write a (multiply), read a + read b + write a
    # (add) = 5 * 8 * n bytes actually moved by the two-op triad
    out_q.put(passes * 5 * 8 * n / elapsed)


def measure(procs: int, mb: int, seconds: float) -> float:
    ctx = mp.get_context("spawn")
    start_evt = ctx.Event()
    out_q = ctx.Queue()
    ps = [
        ctx.Process(target=_worker, args=(mb, seconds, start_evt, out_q))
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    time.sleep(2.0)  # let every worker finish paging in
    start_evt.set()
    total = sum(out_q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8,16,32")
    ap.add_argument("--mb", type=int, default=256, help="array MB per worker")
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()

    levels = []
    base = None
    for p in (int(x) for x in args.procs.split(",")):
        gbps = measure(p, args.mb, args.seconds)
        if base is None:
            base = gbps
        levels.append(
            {
                "procs": p,
                "agg_gbps": round(gbps, 2),
                "speedup_vs_1": round(gbps / base, 2),
                "efficiency_vs_1": round(gbps / base / p, 3),
            }
        )
        print(json.dumps(levels[-1]))

    out = {
        "kernel": "numpy STREAM-like triad, independent processes, "
        f"{args.mb} MB arrays/worker, {args.seconds}s window",
        "levels": levels,
        "date": date.today().isoformat(),
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "membw.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {bench_dir}/membw.json")


if __name__ == "__main__":
    main()
