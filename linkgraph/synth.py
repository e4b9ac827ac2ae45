"""Deterministic synthesis of the north-rule input table.

BASELINE.json input_hint: an Iceberg table of source-code repositories
with columns ``(repo string, path string, commit string, lang string,
content string)``. No external data exists in this sandbox, so tests and
benchmarks synthesize the table at small scale with a fixed seed
(FIXTURES.md SS1): ~R repos x ~F files, each file's content embeds
``import <repo>/<path>`` references to other files with a power-law
out-degree so a few hub files have hundreds of references (exercises the
salting path, mirroring the reference's skew fixture
pregelix-example/data/skew/data.txt via SkewTest.java:40-66).

Generation is pure Python with ``random.Random(seed)`` so the same
(seed, n_repos, files_per_repo) always produces byte-identical content
(the sha256-per-row invariant is checked against this).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LANGS = ["python", "java", "go", "rust", "scala"]

CODE_FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

_WORDS = (
    "def class return import static void func let mut pub fn val "
    "table join scan hash sort merge shuffle partition vertex edge "
    "rank label component triangle graph superstep message combine"
).split()


def synth_code_files_rows(
    n_repos: int = 50,
    files_per_repo: int = 20,
    seed: int = 42,
    hub_count: int = 2,
    hub_degree: int = 150,
) -> list[tuple]:
    """Deterministic rows for the code_files table.

    Out-degree is power-law-ish: most files embed 0-10 references,
    ``hub_count`` files embed ``hub_degree`` references.
    """
    rng = random.Random(seed)
    names = [
        (f"org{r % 7}/proj{r}", f"src/m{f % 5}/file{f}.py")
        for r in range(n_repos)
        for f in range(files_per_repo)
    ]
    n = len(names)
    rows = []
    for i, (repo, path) in enumerate(names):
        if i < hub_count:
            degree = min(hub_degree, n - 1)
        else:
            # power-law-ish: many 0-2, few up to 10
            degree = min(int(rng.paretovariate(1.5)) - 1, 10)
        refs = set()
        while len(refs) < degree:
            j = rng.randrange(n)
            if j != i:
                refs.add(j)
        body_words = [rng.choice(_WORDS) for _ in range(rng.randrange(5, 30))]
        lines = [" ".join(body_words)]
        for j in sorted(refs):
            rrepo, rpath = names[j]
            lines.append(f"import {rrepo}/{rpath}")
        lines.append(" ".join(rng.choice(_WORDS) for _ in range(rng.randrange(0, 10))))
        content = "\n".join(lines)
        commit = f"{rng.getrandbits(160):040x}"
        lang = LANGS[i % len(LANGS)]
        rows.append((repo, path, commit, lang, content))
    return rows


def synth_code_files(
    spark: SparkSession,
    n_repos: int = 50,
    files_per_repo: int = 20,
    seed: int = 42,
    hub_count: int = 2,
    hub_degree: int = 150,
    num_partitions: int | None = None,
) -> DataFrame:
    rows = synth_code_files_rows(n_repos, files_per_repo, seed, hub_count, hub_degree)
    df = spark.createDataFrame(rows, CODE_FILES_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def adjacency_to_edges(adj: dict[int, list[int]]) -> list[tuple[int, int]]:
    """Flatten an adjacency-dict fixture (FIXTURES.md SS2) to edge tuples."""
    return [(int(s), int(d)) for s, ds in adj.items() for d in ds]


# The reference's 20-vertex webmap golden graph, transcribed from
# pregelix-example/data/webmap/webmap_link.txt (format: `src dst...`).
# Self-loops (1->1, 2->2, 11->11, ...) are intentional and kept.
WEBMAP = {
    0: [1],
    1: [1, 2],
    2: [1, 2, 3],
    3: [1, 2, 3, 4],
    4: list(range(1, 6)),
    5: list(range(1, 7)),
    6: list(range(1, 8)),
    7: list(range(1, 9)),
    8: list(range(1, 10)),
    9: list(range(1, 11)),
    10: [11],
    11: [11, 12],
    12: [11, 12, 13],
    13: list(range(11, 15)),
    14: list(range(11, 16)),
    15: list(range(11, 17)),
    16: list(range(11, 18)),
    17: list(range(11, 19)),
    18: list(range(11, 20)),
    19: [0] + list(range(11, 20)),
}

# pregelix-example/data/webmapcomplex: webmap plus dangling refs (50,
# 99, 101 appear only as edge targets; 22-24 only as 21's targets; 25
# and 27 are isolated vertex lines). Used by the *RealComplex golden
# tests, incl. reachability src=1 dst=10 / dst=25.
WEBMAPCOMPLEX = {
    0: [1, 50],
    1: [1, 2],
    2: [1, 2, 3],
    3: [1, 2, 3, 4],
    4: list(range(1, 6)),
    5: list(range(1, 7)),
    6: list(range(1, 8)),
    7: list(range(1, 9)),
    8: list(range(1, 10)),
    9: list(range(1, 11)),
    10: [11, 99],
    11: [11, 12, 101],
    12: [11, 12, 13],
    13: list(range(11, 15)),
    14: list(range(11, 16)),
    15: list(range(11, 17)),
    16: list(range(11, 18)),
    17: list(range(11, 19)),
    18: list(range(11, 20)),
    19: [0] + list(range(11, 20)),
    21: [22, 23, 24],
    25: [],
    27: [],
}

# pregelix-example/data/clique/clique.txt (adjacency as given; note the
# asymmetry: 2 lists 5 but 5 does not list 2 — the reference's triangle
# counter consumes adjacency as-given, TriangleCountingVertex.java:52-97).
CLIQUE = {
    1: [2, 3, 4],
    2: [1, 3, 4, 5],
    3: [1, 2, 4, 5],
    4: [1, 2, 3],
    5: [6, 7],
    6: [5, 7],
    7: [5, 6],
}

# pregelix-example/data/clique2/clique.txt
CLIQUE2 = {
    1: [2, 3, 4],
    2: [1, 3],
    3: [1, 2, 4, 5],
    4: [1, 3],
    5: [3, 6],
    6: [5],
}

# pregelix-example/data/clique3/clique.txt — two K9s bridged via 0/10/19
CLIQUE3 = {
    0: [1, 19],
    **{i: [j for j in range(1, 10) if j != i] for i in range(1, 9)},
    9: [1, 2, 3, 4, 5, 6, 7, 8, 10],
    10: [9, 11],
    11: [10] + list(range(12, 20)),
    **{i: [j for j in range(11, 20) if j != i] for i in range(12, 19)},
    19: [0] + list(range(11, 19)),
}


def edges_df(spark: SparkSession, edges: list[tuple[int, int]]) -> DataFrame:
    schema = T.StructType(
        [T.StructField("src", T.LongType(), False), T.StructField("dst", T.LongType(), False)]
    )
    return spark.createDataFrame([(int(s), int(d)) for s, d in edges], schema)
