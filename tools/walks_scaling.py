"""Two-parallelism scaling evidence for the random-walk engine
(north-rule style: same job at N and 4N cores, throughput at both +
scaling efficiency).

Each level runs in its own subprocess/JVM via _walks_scaling_run.py
with per-core-proportional heap, mirroring tools/bench_scaling.py.
Pairs follow the PageRank ladder's convention: the input grows with the
core count so every level has real per-task work (fixed per-step job
overhead otherwise dominates the high-core level — measured 0.783 vs
0.858 efficiency for 4M vs 8M vertices on the 2->8 pair).
Efficiency = (steady_step_lo / steady_step_hi) / (cores_hi / cores_lo).
Both levels of a pair run the identical input and must produce the
identical corpus checksum (the walk is a pure function of
(graph, seed)).

Usage: python tools/walks_scaling.py [--pairs 2:8:8000000,8:32:40000000]
       [--length 16] [--warmup 4] [--retries 3]
       [--out BENCH/walks_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def run_level(cores: int, n: int, length: int, warmup: int) -> dict:
    cmd = [
        sys.executable,
        str(ROOT / "tools" / "_walks_scaling_run.py"),
        str(cores),
        str(n),
        str(length),
        str(2 * cores),
        str(warmup),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from level {cores}: {out.stderr[-2000:]}")


def run_level_best(
    cores: int, n: int, length: int, retries: int, warmup: int
) -> dict:
    """Best-of-retries per level: this virtualized box shows bursty
    10-25% hypervisor CPU steal (recorded as ``steal_pct`` per run),
    so a single sample can be 3-4x off. Take the fastest steady-state
    median across `retries` runs; every attempt's (median, steal%) is
    kept in ``attempts`` so the selection is auditable."""
    runs = [run_level(cores, n, length, warmup) for _ in range(retries)]
    best = min(runs, key=lambda r: r["steady_median_step_sec"])
    best["attempts"] = [
        {"steady_median_step_sec": r["steady_median_step_sec"], "steal_pct": r.get("steal_pct")}
        for r in runs
    ]
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--pairs",
        default="2:8:8000000,8:32:40000000",
        help="comma-separated lo:hi:n_vertices ladder pairs",
    )
    # 16 steps so the steady median sits well past the warmup window
    # at every level (8 steps left the 32-core median inside warmup)
    ap.add_argument("--length", type=int, default=16)
    ap.add_argument("--retries", type=int, default=3)
    # JIT/shuffle-path warmup runs ~4 steps at 32 threads (measured:
    # 32.1, 18.1, 11.1, 11.0 then steady ~5.5s on the 16M graph);
    # exclude the same fixed count at EVERY level so the pairing
    # grades the dataflow, not JVM compilation
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--out", default=str(ROOT / "BENCH" / "walks_scaling.json"))
    args = ap.parse_args()

    levels: list[dict] = []
    pairs: list[dict] = []
    for spec in args.pairs.split(","):
        lo_c, hi_c, n = (int(x) for x in spec.split(":"))
        lo = run_level_best(lo_c, n, args.length, args.retries, args.warmup)
        print(json.dumps(lo), flush=True)
        hi = run_level_best(hi_c, n, args.length, args.retries, args.warmup)
        print(json.dumps(hi), flush=True)
        assert lo["corpus_checksum"] == hi["corpus_checksum"], "answers differ"
        assert lo["corpus_rows"] == hi["corpus_rows"]
        eff = round(
            (lo["steady_median_step_sec"] / hi["steady_median_step_sec"])
            / (hi["cores"] / lo["cores"]),
            3,
        )
        levels += [lo, hi]
        pairs.append(
            {
                "n_cores": lo_c,
                "4n_cores": hi_c,
                "n_vertices": n,
                "throughput_n": lo["walker_steps_per_sec"],
                "throughput_4n": hi["walker_steps_per_sec"],
                "efficiency": eff,
                "corpus_checksum_match": True,
            }
        )
        print(json.dumps(pairs[-1]), flush=True)

    result = {
        "workload": "random_walks (production xxhash64 coins, 1 walk/vertex,"
        " fixed-width walker state)",
        "walk_length": args.length,
        "levels": levels,
        "pairs": pairs,
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps({"pairs": pairs, "out": args.out}))


if __name__ == "__main__":
    main()
