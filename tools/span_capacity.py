"""Capacity probe: span-granular substring dedup at 1M documents.

`duplicate_spans` + `cut_duplicate_spans` (round 5) claim an
O(actual duplication) shape: positional shingles ship as 8-byte
xxhash64 identities, the document-frequency filter absorbs everything
non-duplicated map-side, and only matched positions reach the per-doc
run window; the cut then meets the corpus in one doc_id join. This
probe runs the production (xxhash) path on a 1M-doc corpus with
PLANTED boilerplate whose closed form makes every output a checksum:

- doc i: 60 tokens; tokens 20..31 (1-based) are a 12-token boilerplate
  block shared by the doc's 10-doc block (df = 10); every other token
  is unique to the doc, so no 8-gram repeats across docs outside the
  boilerplate.
- expected spans: exactly ONE per doc — (span_start 20, span_end 31,
  n_grams 5) — so n_span_rows == n_docs and sum(n_grams) == 5 * n_docs.
- expected cut: sum(n_tokens_cut) == 12 * n_docs; kept tokens
  == 48 * n_docs.

Writes BENCH/span_capacity.json. Usage:
  python tools/span_capacity.py [--n-docs 1000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TOKENS = 60
BOILER_LO, BOILER_HI = 20, 31  # 1-based inclusive -> 12 tokens
N = 8  # shingle width


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.pipeline.dedup import cut_duplicate_spans, duplicate_spans

    heap_gb = max(3, int(args.cores * 1.5))
    spark = get_spark(
        app_name="span-capacity",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.partitions,
        extra_conf={
            "spark.driver.memory": f"{heap_gb}g",
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={args.cores}"
                f" -Xms{heap_gb}g -XX:+AlwaysPreTouch"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # fully distributed synthesis, no driver-side data
    text = (
        "concat_ws(' ', transform(sequence(1, {T}), j ->"
        " CASE WHEN j >= {LO} AND j <= {HI}"
        "  THEN concat('bl', id DIV 10, '_', j)"
        "  ELSE concat('u', id, '_', j) END))"
    ).format(T=TOKENS, LO=BOILER_LO, HI=BOILER_HI)
    docs = (
        spark.range(args.n_docs)
        .select(F.col("id").alias("doc_id"), F.expr(text).alias("text"))
        .repartition(args.partitions)
        .persist()
    )
    n_docs = docs.count()  # materialize before the clock

    t0 = time.monotonic()
    spans = duplicate_spans(docs, n=N, min_docs=2)  # production xxhash mode
    srow = spans.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_grams").alias("grams"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("covered"),
    ).first()
    t_spans = round(time.monotonic() - t0, 3)

    t1 = time.monotonic()
    cut = cut_duplicate_spans(docs, n=N, min_docs=2)
    crow = cut.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens_cut").alias("cut"),
        F.sum(F.col("n_tokens") - F.col("n_tokens_cut")).alias("kept"),
    ).first()
    t_cut = round(time.monotonic() - t1, 3)

    boiler = BOILER_HI - BOILER_LO + 1
    expect = {
        "span_rows": n_docs,
        "gram_sum": (boiler - N + 1) * n_docs,
        "covered_tokens": boiler * n_docs,
        "cut_rows": n_docs,
        "tokens_cut": boiler * n_docs,
        "tokens_kept": (TOKENS - boiler) * n_docs,
    }
    got = {
        "span_rows": int(srow["rows"]),
        "gram_sum": int(srow["grams"]),
        "covered_tokens": int(srow["covered"]),
        "cut_rows": int(crow["rows"]),
        "tokens_cut": int(crow["cut"]),
        "tokens_kept": int(crow["kept"]),
    }
    level = {
        "n_docs": n_docs,
        "tokens_per_doc": TOKENS,
        "shingle_n": N,
        "cores": args.cores,
        "shuffle_partitions": args.partitions,
        "span_discovery_sec": t_spans,
        "cut_total_sec": t_cut,
        "docs_per_sec_cut": round(n_docs / t_cut, 1) if t_cut else None,
        "expected": expect,
        "got": got,
        "all_checksums_match": expect == got,
    }
    # accumulate one entry per corpus size (two-size evidence of the
    # linear shape) instead of overwriting
    path = Path(__file__).resolve().parents[1] / "BENCH" / "span_capacity.json"
    out = {
        "workload": (
            "duplicate_spans + cut_duplicate_spans, production xxhash mode,"
            " planted per-block boilerplate"
        ),
        "levels": [],
    }
    if path.exists():
        try:
            prev = json.loads(path.read_text())
            out["levels"] = [
                lv
                for lv in prev.get("levels", [prev] if "n_docs" in prev else [])
                if lv.get("n_docs") != n_docs
            ]
        except (OSError, json.JSONDecodeError):
            pass
    out["levels"].append(level)
    out["levels"].sort(key=lambda lv: lv["n_docs"])
    out["all_checksums_match"] = all(
        lv.get("all_checksums_match") for lv in out["levels"]
    )
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    assert expect == got, "checksum mismatch"
    spark.stop()


if __name__ == "__main__":
    main()
