"""Tiler, merging, and recovery-manifest tests."""

import json
import os

import numpy as np
import pytest

from treedetection_tpu.geo import Affine, GeoTiff, write_geotiff
from treedetection_tpu import preprocessing, merging, recoveries


def square(x0, y0, size):
    return np.array([[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]],
                    dtype=np.float64)


class TestTileGrid:
    def test_grid_covers_bounds(self):
        xs, ys = preprocessing.tile_grid((0, 0, 100, 100), 50, 50)
        assert len(xs) == 4
        assert set(zip(xs.tolist(), ys.tolist())) == {(0, 0), (0, 50), (50, 0), (50, 50)}

    def test_grid_partial_tile(self):
        xs, ys = preprocessing.tile_grid((0, 0, 120, 60), 50, 50)
        # arange semantics: 0,50,100 x 0,50
        assert len(xs) == 6


class TestForestFlags:
    def test_no_outline_all_false(self):
        xs, ys = preprocessing.tile_grid((0, 0, 100, 100), 50, 50)
        of, ou = preprocessing.compute_forest_flags(xs, ys, 50, 50, 0, None)
        assert not of.any() and not ou.any()

    def test_flags(self):
        xs = np.array([0.0, 200.0, 0.0])
        ys = np.array([0.0, 200.0, 200.0])
        forest = [square(-10, -10, 80)]  # fully covers tile 0, misses tiles 1/2
        of, ou = preprocessing.compute_forest_flags(xs, ys, 50, 50, 5, forest,
                                                    coverage_resolution=1.0)
        assert of.tolist() == [True, False, False]
        assert ou.tolist() == [False, True, True]

    def test_partial_coverage_neither_flag(self):
        xs, ys = np.array([0.0]), np.array([0.0])
        forest = [square(25, -10, 100)]  # covers right half of the tile only
        of, ou = preprocessing.compute_forest_flags(xs, ys, 50, 50, 0, forest,
                                                    coverage_resolution=1.0)
        assert not of[0] and not ou[0]


class TestTileSingleFile:
    def test_metadata_schema(self, tmp_raster, tmp_path):
        out = preprocessing.tile_single_file(
            tmp_raster["rgb"], str(tmp_path / "tiles"), buffer=20,
            tile_width=50, tile_height=50)
        with open(out) as fh:
            meta = json.load(fh)
        # 500px at 0.2m = 100m -> 2x2 grid of 50m tiles
        assert len(meta) == 4
        tid = next(iter(meta))
        assert tid.startswith("324125317_")
        parts = tid.split("_")
        assert parts[-3:] == ["50", "20", "25832"]
        entry = meta[tid]
        assert set(entry) == {"crs", "transform", "bounds", "only_forest", "only_urban"}
        assert entry["crs"] == 25832
        minx, miny, maxx, maxy = entry["bounds"]
        assert maxx - minx == 90 and maxy - miny == 90  # 50 + 2*20 buffer
        # transform origin must sit at the buffered bbox top-left pixel
        t = entry["transform"]
        assert abs(t[2] - minx) < 0.2 + 1e-9
        assert abs(t[5] - maxy) < 0.2 + 1e-9

    def test_recovery_skip_and_reset(self, tmp_raster, tmp_path):
        tiles = str(tmp_path / "tiles")
        cfg = {"tiles_path": tiles, "buffer": 20, "tile_width": 50,
               "tile_height": 50, "logger": None}
        files = preprocessing.tile_data(cfg, [tmp_raster["rgb"]])
        assert len(files) == 1
        assert preprocessing.load_recovery_data(tiles, 20, 50, 50) == [tmp_raster["rgb"]]
        # param change resets
        assert preprocessing.load_recovery_data(tiles, 10, 50, 50) == []
        # deleting the metadata invalidates the manifest entry
        os.remove(files[0])
        assert preprocessing.load_recovery_data(tiles, 20, 50, 50) == []


class TestMerging:
    def _write_pair(self, tmp_path, horizontal=True):
        t0 = Affine.from_origin(1000.0, 2000.0, 1.0, 1.0)
        if horizontal:
            t1 = Affine.from_origin(1100.0, 2000.0, 1.0, 1.0)
        else:
            t1 = Affine.from_origin(1000.0, 1900.0, 1.0, 1.0)
        a = np.full((100, 100, 3), 10, dtype=np.uint8)
        b = np.full((100, 100, 3), 200, dtype=np.uint8)
        pa = str(tmp_path / "FDOP20_111_rgbi.tif")
        pb = str(tmp_path / "FDOP20_222_rgbi.tif")
        write_geotiff(pa, a, t0, crs=25832)
        write_geotiff(pb, b, t1, crs=25832)
        return pa, pb

    def test_neighbor_detection(self, tmp_path):
        pa, pb = self._write_pair(tmp_path, horizontal=True)
        meta = {}
        for f in (pa, pb):
            g = GeoTiff(f)
            meta[f] = (g.transform, g.width, g.height)
        left, right, up, down = merging.retrieve_neighbors(pa, [pa, pb], meta)
        assert right == pb and left is None and down is None

    def test_seam_strip_content(self, tmp_path):
        pa, pb = self._write_pair(tmp_path, horizontal=True)
        cfg = {"merged_path": "merged", "tile_width": 10, "tile_height": 10,
               "buffer": 5, "overlapping_tiles_width": 2,
               "overlapping_tiles_height": 2, "logger": None}
        images = [pa, pb]
        heights = []
        merging.merge_and_crop_images(cfg, images, heights)
        new = [p for p in images if "merged" in p]
        assert len(new) == 1
        name = os.path.basename(new[0])
        assert name == "FDOP20_1000_2000_1100_2000_rgbi.tif"
        g = GeoTiff(new[0])
        # strip: (10 + 2*5) * 2 = 40 px wide, centered on the seam at col 100
        assert g.width == 40 and g.height == 100
        arr = g.read()
        assert (arr[:, :20] == 10).all() and (arr[:, 20:] == 200).all()
        assert g.transform.c == 1080.0  # 1000 + (200/2 - 20) * 1m

    def test_vertical_strip(self, tmp_path):
        pa, pb = self._write_pair(tmp_path, horizontal=False)
        cfg = {"merged_path": "merged", "tile_width": 10, "tile_height": 10,
               "buffer": 5, "overlapping_tiles_width": 2,
               "overlapping_tiles_height": 2, "logger": None}
        images, heights = [], [pa, pb]
        merging.merge_and_crop_images(cfg, images, heights)
        new = [p for p in heights if "merged" in p]
        assert len(new) == 1
        assert os.path.basename(new[0]) == "FDOP20_1000200010001900_rgbi.tif"
        g = GeoTiff(new[0])
        assert g.height == 40 and g.width == 100
        arr = g.read()
        assert (arr[:20] == 10).all() and (arr[20:] == 200).all()


class TestRecoveries:
    def test_prediction_recovery(self, tmp_path):
        out = str(tmp_path)
        img = "/data/a.tif"
        pred_dir = tmp_path / "a"
        pred_dir.mkdir()
        (pred_dir / "Prediction_t1.json").write_text("{}")
        recoveries.save_prediction_recovery_data(out, "model.pth", [img])
        # complete: 1 file, 1 non-excluded tile
        tiles = {img: {"t1": {"only_forest": False}, "t2": {"only_forest": True}}}
        done = recoveries.load_prediction_recovery_data(out, "model.pth", tiles, "only_forest")
        assert done == [img]
        # wrong model resets
        assert recoveries.load_prediction_recovery_data(out, "other.pth", tiles, "only_forest") == []
        # more expected tiles than files -> not done
        tiles2 = {img: {"t1": {}, "t2": {}}}
        assert recoveries.load_prediction_recovery_data(out, "model.pth", tiles2, "only_forest") == []

    def test_postprocess_recovery_param_keying(self, tmp_path):
        out = str(tmp_path)
        params = {"confidence_threshold": 0.3, "height_threshold": 3}
        recoveries.save_postprocess_recovery_data(out, params, ["f1.gpkg"])
        assert recoveries.load_postprocess_recovery_data(out, params) == ["f1.gpkg"]
        assert recoveries.load_postprocess_recovery_data(out, {**params, "height_threshold": 4}) == []

    def test_sharded_manifests_merge(self, tmp_path, monkeypatch):
        out = str(tmp_path)
        monkeypatch.setenv("TREEDETECTION_HOST_ID", "0")
        recoveries.save_stitching_recovery_data(out, ["a.gpkg"])
        monkeypatch.setenv("TREEDETECTION_HOST_ID", "1")
        recoveries.save_stitching_recovery_data(out, ["b.gpkg"])
        assert recoveries.load_stitching_recovery_data(out) == ["a.gpkg", "b.gpkg"]

    def test_continue_file(self, tmp_path):
        p = tmp_path / "continue.yml"
        p.write_text("skip:\n  - img1.tif\n  - img2.tif\n")
        assert recoveries.load_continue_file(str(p)) == ["img1.tif", "img2.tif"]
        assert recoveries.load_continue_file(None) == []
