"""Text sources/sinks (TextVertexInput/OutputFormat, generated ring)
— round-trip the actual reference fixture format."""

import math

from linkgraph import (
    adjacency_text_graph,
    pagerank,
    ring_graph,
    write_vertex_text,
)
from linkgraph.synth import WEBMAP


def _webmap_text(tmp_path):
    p = tmp_path / "webmap.txt"
    lines = [" ".join([str(k)] + [str(d) for d in ds]) for k, ds in WEBMAP.items()]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


class TestTextSources:
    def test_adjacency_text_roundtrip(self, spark, tmp_path):
        verts, edges = adjacency_text_graph(spark, _webmap_text(tmp_path))
        assert verts.count() == 20
        got = {(r["src"], r["dst"]) for r in edges.collect()}
        exp = {(s, d) for s, ds in WEBMAP.items() for d in ds}
        assert got == exp

    def test_isolated_vertex_line(self, spark, tmp_path):
        p = tmp_path / "iso.txt"
        p.write_text("1 2 3\n7\n")
        verts, edges = adjacency_text_graph(spark, str(p))
        assert {r["id"] for r in verts.collect()} == {1, 7}
        assert edges.count() == 2

    def test_text_pagerank_matches_golden(self, spark, tmp_path):
        # the full reference path: text fixture -> graph -> PageRank
        _, edges = adjacency_text_graph(spark, _webmap_text(tmp_path))
        ranks, _ = pagerank(edges, fixed_updates=9)
        v0 = ranks.filter("id = 0").first()["rank"]
        assert math.isclose(v0, 0.008290140026154316, abs_tol=1e-9)

    def test_ring_graph(self, spark):
        edges = ring_graph(spark, 5)
        assert {(r["src"], r["dst"]) for r in edges.collect()} == {
            (0, 1), (1, 2), (2, 3), (3, 4), (4, 0)
        }

    def test_write_vertex_text_sorted(self, spark, tmp_path):
        edges = ring_graph(spark, 6)
        ranks, _ = pagerank(edges, fixed_updates=3)
        out = str(tmp_path / "out")
        write_vertex_text(ranks.select("id", "rank"), out, sort=True)
        lines = [
            l for l in spark.read.text(out).toPandas()["value"].tolist() if l.strip()
        ]
        ids = [int(l.split("\t")[0]) for l in lines]
        assert ids == sorted(ids) and len(ids) == 6
        # ring PageRank: perfectly symmetric, every rank = 1/6
        assert all(math.isclose(float(l.split("\t")[1]), 1 / 6, abs_tol=1e-12) for l in lines)
