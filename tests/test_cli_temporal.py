"""CLI `temporal` subcommand (ADVICE r3: the default time column used to
be dropped by the loader, so `temporal` always failed without
--weight-col)."""

import pytest


TEDGES = [(0, 1, 5), (1, 2, 7), (0, 3, 10), (3, 4, 2), (5, 6, 3)]


class TestCliTemporal:
    def _write_edges(self, spark, tmp_path, time_name="t"):
        path = str(tmp_path / "tedges")
        spark.createDataFrame(
            TEDGES, f"src long, dst long, {time_name} long"
        ).write.parquet(path)
        return path

    def test_default_t_column_kept(self, spark, tmp_path):
        from linkgraph import cli

        epath = self._write_edges(spark, tmp_path)
        out = str(tmp_path / "arrivals")
        cli.main(["temporal", "--edges", epath, "--source", "0",
                  "--output", out])
        arr = {r["id"]: r["arrival"]
               for r in spark.read.parquet(out).collect()}
        assert arr[1] == 5 and arr[2] == 7 and arr[5] is None

    def test_explicit_weight_col(self, spark, tmp_path):
        from linkgraph import cli

        epath = self._write_edges(spark, tmp_path, time_name="ts")
        out = str(tmp_path / "arrivals2")
        cli.main(["temporal", "--edges", epath, "--source", "0",
                  "--weight-col", "ts", "--output", out])
        arr = {r["id"]: r["arrival"]
               for r in spark.read.parquet(out).collect()}
        assert arr[1] == 5 and arr[2] == 7

    def test_missing_time_column_clear_error(self, spark, tmp_path):
        from linkgraph import cli

        path = str(tmp_path / "plain")
        spark.createDataFrame(
            [(0, 1), (1, 2)], "src long, dst long"
        ).write.parquet(path)
        with pytest.raises(SystemExit, match="timestamp"):
            cli.main(["temporal", "--edges", path, "--source", "0",
                      "--output", str(tmp_path / "x")])
