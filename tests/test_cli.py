"""CLI tests (argument routing + eval/voronoi subcommands)."""

import json

import numpy as np
import pytest

from treedetection_tpu.cli import main


def square(x0, y0, size):
    return np.array([[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]],
                    dtype=np.float64)


class TestCli:
    def test_eval_subcommand(self, tmp_path, capsys):
        from treedetection_tpu.vector import write_gpkg
        pred = str(tmp_path / "pred.gpkg")
        gt = str(tmp_path / "gt.gpkg")
        write_gpkg(pred, [square(0, 0, 10)], [{"Confidence_score": 0.9}])
        write_gpkg(gt, [square(0, 0, 10)],
                   [{"Area": 100.0, "TreeHeight": 10, "MeanNDVI": 0.5}])
        assert main(["eval", pred, gt]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["tp"] == 1 and out["f1"] == 1.0

    def test_voronoi_subcommand(self, tmp_path, capsys):
        from treedetection_tpu.geo import Affine, write_geotiff
        h = np.zeros((60, 60), dtype=np.float32)
        yy, xx = np.mgrid[0:60, 0:60]
        h += 12 * np.exp(-((xx - 30) ** 2 + (yy - 30) ** 2) / 50.0)
        tif = str(tmp_path / "n.tif")
        write_geotiff(tif, h, Affine.identity(), crs=25832)
        out = str(tmp_path / "crowns.gpkg")
        assert main(["voronoi", tif, out]) == 0
        assert "1 crowns" in capsys.readouterr().out

    def test_requires_command(self):
        with pytest.raises(SystemExit):
            main([])
