"""Compat-surface tests: RLE codec, polygon_from_mask, clean_crowns,
project_to_geojson."""

import numpy as np
import pytest

from treedetection_tpu.compat import (
    clean_crowns, element_is_near_border, polygon_from_mask,
    project_to_geojson, rle_decode, rle_encode)


def square(x0, y0, size):
    return np.array([[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]],
                    dtype=np.float64)


class TestRLE:
    def test_roundtrip(self, rng):
        mask = (rng.random((37, 53)) > 0.6).astype(np.uint8)
        rle = rle_encode(mask)
        back = rle_decode(rle)
        assert np.array_equal(back, mask)

    def test_empty_and_full(self):
        z = np.zeros((10, 10), dtype=np.uint8)
        assert rle_decode(rle_encode(z)).sum() == 0
        o = np.ones((10, 10), dtype=np.uint8)
        assert rle_decode(rle_encode(o)).sum() == 100

    def test_polygon_from_mask(self):
        mask = np.zeros((30, 30), dtype=np.uint8)
        mask[5:15, 10:25] = 1
        flat = polygon_from_mask(mask)
        pts = np.asarray(flat).reshape(-1, 2)
        assert pts[:, 0].min() == 10 and pts[:, 0].max() == 24
        assert pts[:, 1].min() == 5 and pts[:, 1].max() == 14
        assert np.array_equal(pts[0], pts[-1])  # closed


class TestCleanCrowns:
    def test_dedupes_overlaps(self):
        crowns = [square(0, 0, 10), square(0.5, 0.5, 10), square(50, 50, 10)]
        scores = [0.9, 0.6, 0.3]
        kept, ks = clean_crowns(crowns, scores, iou_threshold=0.7,
                                confidence=0.2)
        assert len(kept) == 2
        assert 0.9 in ks and 0.3 in ks

    def test_confidence_floor(self):
        crowns = [square(0, 0, 10), square(50, 50, 10)]
        kept, ks = clean_crowns(crowns, [0.9, 0.1], confidence=0.2)
        assert ks == [0.9]


class TestBorder:
    def test_near_border(self):
        rb = (0, 0, 100, 100)
        assert element_is_near_border((0.2, 50, 10, 60), rb, eps=1.0)
        assert not element_is_near_border((40, 40, 60, 60), rb, eps=1.0)


class TestProjectToGeojson:
    def test_projects_rle_predictions(self, tmp_path):
        import json
        mask = np.zeros((20, 20), dtype=np.uint8)
        mask[4:12, 6:16] = 1
        rle = rle_encode(mask)
        tile_id = "img_100_200_50_20_25832"
        pred = tmp_path / f"Prediction_{tile_id}.json"
        pred.write_text(json.dumps([
            {"score": 0.8, "segmentation": rle},
        ]))
        meta = {tile_id: {"crs": 25832,
                          "transform": [1.0, 0.0, 80.0, 0.0, -1.0, 270.0]}}
        outs = project_to_geojson([str(pred)], meta, str(tmp_path / "gj"))
        assert len(outs) == 1
        from treedetection_tpu.vector.geojson import read_geojson
        geoms, props = read_geojson(outs[0])
        ring = geoms[0][0][0]
        # pixel x=6..15 -> geo 86..95
        assert 85 <= ring[:, 0].min() <= 87
        assert props[0]["Confidence_score"] == 0.8


class TestStitchingRLEFallback:
    def test_stitch_rle_prediction(self, tmp_path):
        import json
        from treedetection_tpu import stitching
        mask = np.zeros((40, 40), dtype=np.uint8)
        mask[10:30, 10:30] = 1
        # pixel coords land inside the shrunk box of this tile id
        tile_id = "img_0_0_50_20_25832"
        pred = tmp_path / f"Prediction_{tile_id}.json"
        pred.write_text(json.dumps([{"score": 0.9,
                                     "segmentation": rle_encode(mask)}]))
        crowns, scores = stitching.stitch_tile_file(str(pred), 0.2, shift=1)
        assert len(crowns) == 1 and scores == [0.9]


class TestStitchCrowns:
    def test_filters_and_concats(self, tmp_path):
        """Legacy detectree2-style stitcher (reference helpers.py:321-408):
        crowns outside the shrunk tile box are dropped, survivors simplified
        and concatenated with the filename CRS."""
        import numpy as np
        from treedetection_tpu.compat import stitch_crowns
        from treedetection_tpu.vector import write_gpkg

        def square(cx, cy, r=2.0, n=16):
            th = np.linspace(0, 2 * np.pi, n, endpoint=False)
            return np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1)

        # tile box: minx=100, miny=200, width=50, buffer=20, epsg=25832
        # -> box (80, 180)..(170, 270); shift=1 -> (81, 181)..(169, 269)
        f = tmp_path / "img_100_200_50_20_25832.gpkg"
        inside = square(120, 220)
        edge = square(82, 182, r=2.0)   # dips below the shifted box
        write_gpkg(str(f), [inside, edge],
                   [{"Confidence_score": 0.9}, {"Confidence_score": 0.8}],
                   srs_id=25832)
        geoms, props, srs = stitch_crowns(str(tmp_path), shift=1.0)
        assert srs == 25832
        assert len(geoms) == 1 and props[0]["Confidence_score"] == 0.9

    def test_empty_folder_raises(self, tmp_path):
        import pytest as _pytest
        from treedetection_tpu.compat import stitch_crowns
        with _pytest.raises(FileNotFoundError):
            stitch_crowns(str(tmp_path))
