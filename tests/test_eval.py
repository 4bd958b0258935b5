"""Evaluation + autolabel tests."""

import numpy as np
import pytest

from treedetection_tpu.eval import (
    confidence_sweep, evaluate, evaluate_grid, filter_annotations,
    greedy_iou_match)


def square(x0, y0, size):
    return np.array([[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]],
                    dtype=np.float64)


class TestMatching:
    def test_perfect_match(self):
        gt = [square(0, 0, 10), square(20, 20, 10)]
        preds = [square(0, 0, 10), square(20, 20, 10)]
        m, up, ug = greedy_iou_match(preds, gt, 0.5)
        assert len(m) == 2 and not up and not ug
        assert all(iou > 0.99 for _, _, iou in m)

    def test_greedy_prefers_best_iou(self):
        gt = [square(0, 0, 10)]
        preds = [square(1, 1, 10), square(0, 0, 10)]  # second is exact
        m, up, ug = greedy_iou_match(preds, gt, 0.3)
        assert m[0][0] == 1  # exact match won
        assert up == [0]

    def test_metrics(self):
        gt = [square(0, 0, 10), square(50, 50, 10)]
        preds = [square(0, 0, 10), square(100, 100, 10)]
        scores = [0.9, 0.9]
        r = evaluate(preds, scores, gt, 0.5, 0.3)
        assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 1)
        assert r["precision"] == 0.5 and r["recall"] == 0.5

    def test_confidence_filters_preds(self):
        gt = [square(0, 0, 10)]
        preds = [square(0, 0, 10), square(100, 100, 5)]
        scores = [0.9, 0.2]
        r = evaluate(preds, scores, gt, 0.5, 0.5)
        assert (r["tp"], r["fp"]) == (1, 0)  # low-conf FP filtered out

    def test_grid_size(self):
        res = evaluate_grid([square(0, 0, 10)], [0.9], [square(0, 0, 10)],
                            iou_thresholds=(0.3, 0.5), conf_thresholds=(0.3, 0.6))
        assert len(res) == 4

    def test_sweep_picks_best(self):
        gt = [square(0, 0, 10)]
        preds = [square(0, 0, 10), square(100, 100, 10), square(200, 200, 10)]
        scores = [0.9, 0.3, 0.35]  # junk below 0.4
        best, results = confidence_sweep(preds, scores, gt,
                                         confidences=[0.1, 0.5, 0.8])
        assert best in (0.5, 0.8)

    def test_annotation_filters(self):
        geoms = [square(0, 0, 3)] * 4
        props = [{"Area": 9.0, "TreeHeight": 10, "MeanNDVI": 0.5},
                 {"Area": 0.5},
                 {"TreeHeight": 1.0},
                 {"MeanNDVI": 0.05}]
        g, p = filter_annotations(geoms, props)
        assert len(g) == 1


class TestVoronoiAutolabel:
    def test_generates_crowns(self, tmp_path):
        from treedetection_tpu.autolabel import generate_voronoi_labels
        from treedetection_tpu.geo import Affine, write_geotiff
        from treedetection_tpu.vector import read_gpkg
        # two gaussian "trees" on flat ground
        h = np.zeros((100, 100), dtype=np.float32)
        yy, xx = np.mgrid[0:100, 0:100]
        for cx, cy, peak in ((30, 30, 15.0), (70, 65, 12.0)):
            h += peak * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 6 ** 2))
        t = Affine.from_origin(1000.0, 1100.0, 1.0, 1.0)
        tif = str(tmp_path / "ndsm.tif")
        write_geotiff(tif, h, t, crs=25832)
        out = str(tmp_path / "labels.gpkg")
        n = generate_voronoi_labels(tif, out)
        assert n == 2
        geoms, props, srs = read_gpkg(out)
        assert srs == 25832
        assert all(p["seed_height"] > 3 for p in props)
        # crowns sit at the right geo positions
        cx = [np.asarray(g[0][0])[:, 0].mean() for g in geoms]
        assert min(cx) < 1040 < max(cx) or min(cx) < 1075

    def test_flat_ground_no_crowns(self, tmp_path):
        from treedetection_tpu.autolabel import generate_voronoi_labels
        from treedetection_tpu.geo import Affine, write_geotiff
        h = np.zeros((50, 50), dtype=np.float32)
        tif = str(tmp_path / "flat.tif")
        write_geotiff(tif, h, Affine.identity(), crs=25832)
        out = str(tmp_path / "labels.gpkg")
        assert generate_voronoi_labels(tif, out) == 0


@pytest.mark.slow
class TestRealSample:
    def test_voronoi_on_reference_ndsm(self, tmp_path):
        """Real-world check: the bundled Baden-Wuerttemberg nDSM sample must
        yield a plausible crown count and valid geometries."""
        import os
        src = "/root/reference/data/nDSM/324125317.tif"
        if not os.path.exists(src):
            pytest.skip("reference sample not present")
        from treedetection_tpu.autolabel import generate_voronoi_labels
        from treedetection_tpu.vector import read_gpkg, polygon_area
        out = str(tmp_path / "crowns.gpkg")
        n = generate_voronoi_labels(src, out)
        # 1 km^2 of partly forested land: hundreds-to-thousands of crowns
        assert 100 < n < 50000
        geoms, props, srs = read_gpkg(out)
        assert srs == 25832
        areas = [polygon_area(g[0][0]) for g in geoms[:200]]
        assert all(a > 0 for a in areas)
        # crowns must lie inside the raster extent
        ring = np.asarray(geoms[0][0][0])
        assert 412000 <= ring[:, 0].min() and ring[:, 0].max() <= 413000
        assert 5317000 <= ring[:, 1].min() and ring[:, 1].max() <= 5318000
