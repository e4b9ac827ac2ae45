"""Measured shuffle savings from locality renumbering (VERDICT r4 #7).

The r4 claim (algorithms/partition_stats.py renumber_by_label): after
community-aligned dense renumbering, range placement keeps
intra-community messages partition-local, turning a community
structure into real shuffle savings. Through r4 that claim was
evidenced only by the partition_quality cut METRIC; this probe measures
the actual bytes.

Experiment — same graph, same plan, two id assignments:

- A planted-partition graph: ``n_comm`` communities of ``comm_size``
  vertices; each vertex links to 4 in-community neighbors (ring + 3
  chords) and each community sends 2 edges to the next (so communities
  are sparse-cut but globally connected, like real web/repo graphs).
- **scrambled** placement: vertex ids are a deterministic bijective
  permutation (id * PRIME mod n) — the arrival-order/hashed placement a
  raw crawl gives you.
- **renumbered** placement: ids from ``renumber_by_label`` over the
  true community labels — each community one contiguous block.

Both runs execute the IDENTICAL job — the superstep loop's one
exchange, a per-destination message combine: range-partition the edge
relation by src (the adjacency placement), emit one message per edge,
``groupBy(dst).sum`` — and the Spark listener's stage metrics (REST
API) report the shuffle bytes/records of the combine exchange alone
(the placement shuffle is materialized and snapshotted out first).

Why records drop: the partial (map-side) aggregate emits one row per
(map partition, dst). Scrambled, a vertex's ~4 in-neighbors land in ~4
different partitions; renumbered, they share one block, so the
pre-shuffle combine collapses them — the measured exchange carries
~1/4 the rows and bytes. That is precisely the mechanism by which a
1000-executor PageRank pays less network per superstep after
renumbering; checksum equality proves both placements compute the same
aggregate.

Why the probe measures the exchange standalone rather than switching
the engine's superstep loop to range placement: the loop's gather join
(cached adjacency ⋈ rank state) stays exchange-free because BOTH sides
hold the same hashpartitioning(id, p) — and that co-partitioning is
the loop's dominant cost saving (it moves the E-sized adjacency zero
times). A range-partitioned adjacency cannot keep that property in
the DataFrame API: Spark's RangeShuffleSpec cannot be the target
partitioning for the other join side (canCreatePartitioning = false),
so EnsureRequirements would fall back to re-hashing BOTH sides —
re-exchanging the cached E-row adjacency EVERY superstep to save a
fraction of the (much smaller) combine exchange. Strictly worse. On a
real deployment the range-placed combine saving composes with a
co-located gather only via a storage-level mechanism (e.g. both sides
bucketed/partitioned by the same explicit id-block function, or a
custom ShuffleSpec) — which is exactly why renumber_by_label emits
CONTIGUOUS dense ids: `id DIV block` is then a stable partition
function both a writer layout and a reader can share. The probe
therefore measures the combine exchange — the one piece renumbering
changes — in isolation, on the same range placement at both id
assignments.

Writes BENCH/renumber_shuffle.json. Usage:
  python tools/renumber_probe.py [--n-comm 20000] [--comm-size 100]
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PRIME = 1_000_003  # coprime to any n below => bijective scramble


def _stage_totals(ui_url: str) -> dict:
    """Cumulative completed-stage shuffle totals from the REST API."""
    apps = json.load(
        urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=10)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        )
    )
    tot = {"shuffle_write_bytes": 0, "shuffle_write_records": 0,
           "shuffle_read_bytes": 0, "shuffle_read_records": 0}
    for st in stages:
        tot["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
        tot["shuffle_write_records"] += st.get("shuffleWriteRecords", 0)
        tot["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
        tot["shuffle_read_records"] += st.get("shuffleReadRecords", 0)
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-comm", type=int, default=20_000)
    ap.add_argument("--comm-size", type=int, default=100)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from linkgraph import get_spark
    from linkgraph.algorithms.partition_stats import renumber_by_label

    n = args.n_comm * args.comm_size
    spark = get_spark(
        app_name="renumber-probe",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.partitions,
        extra_conf={
            "spark.ui.enabled": "true",
            # fixed physical plan: the probe compares metrics between
            # two runs of the same shape, so no runtime re-planning
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    # planted-partition graph over TRUE ids u in [0, n): community
    # c(u) = u // comm_size; 4 intra edges per vertex + 2 inter per
    # community (all JVM-side expressions)
    cs = args.comm_size
    base = spark.range(n).select(F.col("id").alias("u"))
    intra = base.select(
        "u",
        F.explode(F.array(F.lit(1), F.lit(3), F.lit(7), F.lit(19))).alias("k"),
    ).select(
        "u",
        (F.expr(f"u DIV {cs}") * cs + (F.col("u") % cs + F.col("k")) % cs).alias("v"),
    )
    comm = spark.range(args.n_comm).select(F.col("id").alias("c"))
    inter = comm.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("c") * cs).alias("u"),
                    (((F.col("c") + 1) % args.n_comm) * cs).alias("v"),
                ),
                F.struct(
                    (F.col("c") * cs + cs // 2).alias("u"),
                    (((F.col("c") + 1) % args.n_comm) * cs + cs // 2).alias("v"),
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    true_edges = intra.unionByName(inter).filter(F.col("u") != F.col("v"))

    # scrambled placement: a genuinely MIXING bijective permutation —
    # dense rank of xxhash64(u) (an affine u*A % n map is NOT mixing:
    # it sends the community's consecutive ids to an arithmetic
    # progression with stride A % n, which can be tiny and preserve
    # locality; A = 1_000_003 over n = 100_000 is literally stride 3)
    from linkgraph.partitioning import dense_index

    scr_map = (
        dense_index(
            base.select("u", F.xxhash64("u").alias("h")), ["h", "u"], "sid"
        )
        .select("u", "sid")
        .persist()
    )
    scr_map.count()
    scrambled = (
        true_edges.join(scr_map, "u")
        .select(F.col("sid").alias("src"), "v")
        .join(scr_map.withColumnRenamed("u", "v"), "v")
        .select("src", F.col("sid").alias("dst"))
    )
    # renumbered placement via the REAL operator over the true labels
    # (keyed by the scrambled ids — the state a crawl actually holds)
    labels = scr_map.select(
        F.col("sid").alias("id"), F.expr(f"u DIV {cs}").alias("component")
    )
    mapping = renumber_by_label(labels).persist()
    mapping.count()
    renumbered = (
        scrambled.join(mapping.withColumnRenamed("id", "src"), "src")
        .select(F.col("new_id").alias("s2"), "dst")
        .join(mapping.withColumnRenamed("id", "dst"), "dst")
        .select(F.col("s2").alias("src"), F.col("new_id").alias("dst"))
    )

    results = {}
    for name, edges in [("scrambled", scrambled), ("renumbered", renumbered)]:
        # adjacency placement: range partition by src, materialized
        # BEFORE the metric snapshot so only the combine exchange is
        # measured
        placed = edges.repartitionByRange(args.partitions, "src").persist()
        n_edges = placed.count()
        before = _stage_totals(ui)
        agg = placed.groupBy("dst").agg(F.count(F.lit(1)).alias("m"))
        checksum = agg.agg(
            F.sum("m").alias("s"), F.count(F.lit(1)).alias("d")
        ).first()
        after = _stage_totals(ui)
        placed.unpersist()
        results[name] = {
            "n_edges": n_edges,
            "checksum_msg_sum": int(checksum["s"]),
            "n_dst": int(checksum["d"]),
            "combine_shuffle_write_bytes": after["shuffle_write_bytes"]
            - before["shuffle_write_bytes"],
            "combine_shuffle_write_records": after["shuffle_write_records"]
            - before["shuffle_write_records"],
            "combine_shuffle_read_bytes": after["shuffle_read_bytes"]
            - before["shuffle_read_bytes"],
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    assert (
        results["scrambled"]["checksum_msg_sum"]
        == results["renumbered"]["checksum_msg_sum"]
    ), "placements disagree on the aggregate"
    out = {
        "workload": (
            "per-destination message combine (the superstep loop's one "
            "exchange) over a range-placed edge relation"
        ),
        "graph": {
            "n_vertices": n,
            "n_communities": args.n_comm,
            "community_size": args.comm_size,
            "n_edges": results["scrambled"]["n_edges"],
        },
        "cores": args.cores,
        "shuffle_partitions": args.partitions,
        "placements": results,
        "bytes_ratio_scrambled_over_renumbered": round(
            results["scrambled"]["combine_shuffle_write_bytes"]
            / max(results["renumbered"]["combine_shuffle_write_bytes"], 1),
            3,
        ),
        "records_ratio_scrambled_over_renumbered": round(
            results["scrambled"]["combine_shuffle_write_records"]
            / max(results["renumbered"]["combine_shuffle_write_records"], 1),
            3,
        ),
        "source": "Spark listener stage metrics via REST API (local UI)",
    }
    (REPO / "BENCH" / "renumber_shuffle.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
