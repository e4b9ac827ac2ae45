"""Gate-rotation tracker: which queries() entries still lack a committed
driver CORRECTNESS row, and does the current dict order put them inside
the driver's ~50-query front window?

The per-round driver gate (CORRECTNESS_r{N}.json) verifies the FIRST ~50
entries of __spark_entry__.queries() in dict order.  To get every query a
committed hash-match row we rotate never-gated queries to the front each
round (``_GATE_FRONT`` in __spark_entry__.py).  This tool derives the
ground truth from the committed CORRECTNESS_r*.json files:

    python tools/gate_rotation.py          # audit current ordering
    python tools/gate_rotation.py --emit   # print a fresh _GATE_FRONT body

Exit status is non-zero if a never-gated query sits outside the front
window while a gated one sits inside it (i.e. the rotation is stale).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WINDOW = 50


def gated_queries(repo: Path) -> set[str]:
    """Names with a committed driver hash-match row in any round."""
    out: set[str] = set()
    for f in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(f)).items():
            if row.get("hash_match"):
                out.add(name)
    return out


def main() -> int:
    repo = Path(__file__).resolve().parents[1]
    import __spark_entry__ as entry

    order = list(entry.queries().keys())
    gated = gated_queries(repo)
    never = [q for q in order if q not in gated]
    front = order[:WINDOW]

    print(f"queries: {len(order)}  driver-gated: {len(order) - len(never)}  "
          f"never-gated: {len(never)}")

    if "--emit" in sys.argv:
        want = never[:WINDOW] + [q for q in never[WINDOW:]]
        print("_GATE_FRONT = [")
        for q in want:
            print(f'    "{q}",')
        print("]")
        return 0

    stale = False
    missed = [q for q in never if q not in front]
    wasted = [q for q in front if q in gated]
    if missed and wasted:
        stale = True
        print(f"STALE rotation: never-gated outside window: {missed}")
        print(f"               gated wasting window slots: {wasted}")
    elif missed:
        print(f"never-gated queued for the NEXT round's window "
              f"(window full of never-gated this round): {missed}")
    else:
        print("every never-gated query is inside the front window")
    return 1 if stale else 0


if __name__ == "__main__":
    sys.exit(main())
