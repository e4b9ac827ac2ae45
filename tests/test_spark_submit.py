"""North-rule launch-mode smoke test: ``spark-submit --py-files linkgraph.zip``.

BASELINE.json's north rule requires the job to launch "via spark-submit
--py-files on a multi-executor cluster" (the reference's analogue is the
Client.main -> Driver.runJob CLI, pregelix-example Client.java:82-86).
This test proves the documented command line actually works: it zips the
package, copies ``cli.py`` OUT of the repo, and runs spark-submit from a
neutral working directory — so the only way ``import linkgraph`` can
resolve inside the driver is through the ``--py-files`` zip, exactly as
on a real cluster where the package is shipped to executors.

Kept cheap: local[2] master, the 20-vertex webmap graph, 9 rank updates
(the PageRankReal golden config), ~30s wall.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit")

GOLDEN_V0 = 0.008290140026154316  # expected/PageRankReal/part-0, vertex 0


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_launch(tmp_path, spark):
    # -- edges parquet for the webmap golden graph ----------------------
    from linkgraph.synth import WEBMAP, adjacency_to_edges, edges_df

    edges_path = str(tmp_path / "edges")
    edges_df(spark, adjacency_to_edges(WEBMAP)).write.parquet(edges_path)

    # -- package zip, as the docs build it ------------------------------
    zip_path = tmp_path / "linkgraph.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "linkgraph").rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(REPO))

    # -- cli.py copied outside the repo: the zip must supply the package
    script = tmp_path / "cli.py"
    shutil.copyfile(REPO / "linkgraph" / "cli.py", script)

    out_path = tmp_path / "ranks"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing but the zip may provide linkgraph
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.driver.host=127.0.0.1",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(zip_path),
            str(script),
            "pagerank",
            "--edges", edges_path,
            "--output", str(out_path),
            "--fixed-updates", "9",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the CLI prints one JSON status line on stdout
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["algorithm"] == "pagerank"
    assert status["supersteps"] == 9

    # -- answer parity: the submitted job reproduces the golden value ---
    got = {
        r["id"]: r["rank"]
        for r in spark.read.parquet(str(out_path)).collect()
    }
    assert len(got) == 20
    assert got[0] == pytest.approx(GOLDEN_V0, abs=1e-12)
