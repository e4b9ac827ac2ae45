"""Katz centrality: NumPy-oracle parity on the webmap fixture plus the
truncated-series identity and convergence mode."""

import math

import pytest

from linkgraph import katz_centrality
from linkgraph.synth import WEBMAP


def _katz_oracle(adj, n, alpha, beta, updates):
    """x_{k+1}(v) = beta + alpha * sum_{u->v} x_k(u), x_0 = beta."""
    x = {v: beta for v in range(n)}
    for _ in range(updates):
        msum = {v: 0.0 for v in range(n)}
        for u, dsts in adj.items():
            for d in dsts:
                msum[d] += x[u]
        x = {v: beta + alpha * msum[v] for v in range(n)}
    return x


def _to_dict(df):
    return {r["id"]: r["katz"] for r in df.collect()}


class TestKatz:
    def test_fixed_updates_matches_oracle(self, webmap_edges):
        out, res = katz_centrality(webmap_edges, alpha=0.05, fixed_updates=6)
        exp = _katz_oracle(WEBMAP, 20, 0.05, 1.0, 6)
        got = _to_dict(out)
        assert set(got) == set(exp)
        for v in exp:
            assert math.isclose(got[v], exp[v], abs_tol=1e-9)
        assert res.supersteps == 6

    def test_convergence_mode_reaches_series_limit(self, webmap_edges):
        out, res = katz_centrality(webmap_edges, alpha=0.03, tol=1e-12)
        assert res.converged
        # far-truncated series == fixpoint at this tolerance
        exp = _katz_oracle(WEBMAP, 20, 0.03, 1.0, 80)
        got = _to_dict(out)
        for v in exp:
            assert math.isclose(got[v], exp[v], abs_tol=1e-9)

    def test_zero_alpha_is_all_beta(self, webmap_edges):
        out, _ = katz_centrality(webmap_edges, alpha=0.0, fixed_updates=2)
        assert set(_to_dict(out).values()) == {1.0}


class TestKatzDriverGate:
    def test_driver_query_matches_duckdb_oracle(self, spark):
        duckdb = pytest.importorskip("duckdb")
        import importlib.util
        from pathlib import Path

        root = Path(__file__).resolve().parents[1]
        spec = importlib.util.spec_from_file_location(
            "entrymod", root / "__spark_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        sf = "/root/testdata/sf0.001"
        got = {
            r["id"]: r["katz"]
            for r in mod.queries()["katz_centrality"](spark, sf).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        exp = dict(con.execute(mod.oracle_sql()["katz_centrality"]).fetchall())
        assert got == exp
