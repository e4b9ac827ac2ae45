"""Two-parallelism scaling evidence for the random-walk engine
(north-rule style: same job at N and 4N cores, throughput at both +
scaling efficiency).

Each level runs in its own subprocess/JVM via _walks_scaling_run.py
with per-core-proportional heap, mirroring tools/bench_scaling.py.
Efficiency = (steady_step_lo / steady_step_hi) / (cores_hi / cores_lo).
Both levels must produce the identical corpus checksum (the walk is a
pure function of (graph, seed)).

Usage: python tools/walks_scaling.py [--n 4000000] [--length 8]
       [--cores 8,32] [--out BENCH/walks_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def run_level(cores: int, n: int, length: int) -> dict:
    cmd = [
        sys.executable,
        str(ROOT / "tools" / "_walks_scaling_run.py"),
        str(cores),
        str(n),
        str(length),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from level {cores}: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--length", type=int, default=8)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--out", default=str(ROOT / "BENCH" / "walks_scaling.json"))
    args = ap.parse_args()

    lo_c, hi_c = (int(c) for c in args.cores.split(","))
    lo = run_level(lo_c, args.n, args.length)
    print(json.dumps(lo), flush=True)
    hi = run_level(hi_c, args.n, args.length)
    print(json.dumps(hi), flush=True)

    assert lo["corpus_checksum"] == hi["corpus_checksum"], "answers differ"
    assert lo["corpus_rows"] == hi["corpus_rows"]
    eff = round(
        (lo["steady_median_step_sec"] / hi["steady_median_step_sec"])
        / (hi["cores"] / lo["cores"]),
        3,
    )
    result = {
        "workload": "random_walks (production xxhash64 coins, 1 walk/vertex)",
        "n_vertices": args.n,
        "n_edges": lo["n_edges"],
        "walk_length": args.length,
        "levels": [lo, hi],
        "throughput_n": lo["walker_steps_per_sec"],
        "throughput_4n": hi["walker_steps_per_sec"],
        "efficiency": eff,
        "corpus_checksum": lo["corpus_checksum"],
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps({"efficiency": eff, "out": args.out}))


if __name__ == "__main__":
    main()
