"""Two-parallelism scaling evidence for the DEDUP pipeline tier
(companion to tools/bench_scaling.py, which covers the superstep loop).

Runs MinHash-LSH near-dup pair generation (production xxhash64 mode)
over the same synthetic corpus at N and 4N cores, each level in its own
subprocess/JVM with fixed per-core resources (tools/_dedup_scaling_run.py),
and reports docs/sec at both plus the scaling efficiency. The discovered
pair count is the same-answer checksum across levels.

Writes BENCH/dedup_scaling.json.

Usage: python tools/dedup_scaling.py [--pair 8,32] [--docs 2000000]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_level(cores: int, n_docs: int, trials: int) -> dict:
    """Best of `trials` runs (each its own JVM): first-run OS/page-cache
    state adds up to 1.7x wall-clock noise between identical runs
    (measured), so single-shot levels grade the box, not the dataflow.
    All raw trials are kept in the result for auditability."""
    runs = []
    for _ in range(trials):
        # Pin the whole level (JVM + pyspark worker processes) to
        # exactly `cores` CPUs. Without affinity a pandas-UDF stage at
        # local[k] burns up to 2k cores (k JVM task threads + k Python
        # workers run concurrently), so the small level is not an
        # N-core executor at all and the measured "scaling" compares
        # 16-ish cores against the 32-core box. A real k-core executor
        # runs its Python workers on the same k cores.
        out = subprocess.run(
            [
                "taskset",
                "-c",
                f"0-{cores - 1}",
                sys.executable,
                str(REPO / "tools" / "_dedup_scaling_run.py"),
                str(cores),
                str(n_docs),
            ],
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                runs.append(json.loads(line))
                break
        else:
            raise RuntimeError(
                f"no JSON from cores={cores}: {out.stdout[-500:]} {out.stderr[-500:]}"
            )
    best = min(runs, key=lambda r: r["wall_sec"])
    best["trials"] = [r["wall_sec"] for r in runs]
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="8,32", help="N,4N core pair")
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pair.split(","))

    levels = [
        run_level(lo, args.docs, args.trials),
        run_level(hi, args.docs, args.trials),
    ]
    for lv in levels:
        print(json.dumps(lv))
    eff = (levels[1]["docs_per_sec"] / levels[0]["docs_per_sec"]) / (hi / lo)
    result = {
        "workload": "minhash_lsh_pairs (xxhash64 production mode) on the synthetic near-dup corpus",
        "n_docs": args.docs,
        "levels": levels,
        "pair": [lo, hi],
        "scaling_efficiency": round(eff, 3),
        "same_answer": levels[0]["n_pairs"] == levels[1]["n_pairs"],
    }
    out_path = REPO / "BENCH" / "dedup_scaling.json"
    out_path.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps({"scaling_efficiency": result["scaling_efficiency"],
                      "same_answer": result["same_answer"]}))


if __name__ == "__main__":
    main()
