"""Summarize the CC scaling ladder: paired-by-index per-superstep
efficiency between two parallelism levels.

CC is the delta-plan workload — the frontier grows then shrinks, so a
single steady-state median across supersteps would average unlike work.
Instead, superstep k at level A performs the IDENTICAL frontier work as
superstep k at level B (the runs assert equal superstep counts and
label checksums), so the right estimator is the per-index wall-time
ratio, summarized by its median over post-warmup steps.

Usage: python tools/cc_scaling_summary.py BENCH/runs/cc_*.jsonl
Prints one JSON line per (small, big) pair found in each file.
"""

from __future__ import annotations

import json
import sys
from statistics import median

WARMUP_STEPS = 2  # JIT/codegen, same exclusion as the PageRank ladder


def summarize(path: str) -> list[dict]:
    runs = [json.loads(l) for l in open(path) if l.strip().startswith("{")]
    out = []
    by_cores = sorted(runs, key=lambda r: r["cores"])
    for a, b in zip(by_cores, by_cores[1:]):
        assert a["n_vertices"] == b["n_vertices"], "pair must share the input"
        assert a["label_sum"] == b["label_sum"], "answers differ between levels"
        assert a["supersteps"] == b["supersteps"], "frontier schedules differ"
        factor = b["cores"] / a["cores"]
        # per_step_sec is rounded to 2dp by the ladder runner, so a
        # collapsed-frontier superstep under ~5ms records as 0.0 (the
        # 4M-probe regime BASELINE.md documents); a zero on either side
        # carries no timing signal at that resolution — drop the pair
        # instead of dividing by it.
        ratios = [
            sa / sb
            for sa, sb in list(zip(a["per_step_sec"], b["per_step_sec"]))[WARMUP_STEPS:]
            if sa > 0 and sb > 0
        ]
        if not ratios:
            continue
        med = median(ratios)
        out.append(
            {
                "file": path,
                "n_vertices": a["n_vertices"],
                "n_edges": a["n_edges"],
                "cores": [a["cores"], b["cores"]],
                "supersteps": a["supersteps"],
                "label_sum": a["label_sum"],
                "loop_sec": [a["loop_sec"], b["loop_sec"]],
                "median_step_speedup": round(med, 3),
                "scaling_efficiency": round(med / factor, 3),
                "per_step_ratio": [round(r, 2) for r in ratios],
            }
        )
    return out


if __name__ == "__main__":
    for p in sys.argv[1:]:
        for row in summarize(p):
            print(json.dumps(row))
