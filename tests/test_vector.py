"""Vector stack tests: polygon math, rasterization, GPKG and shapefile I/O."""

import math
import struct

import numpy as np
import pytest

from treedetection_tpu.geo import Affine
from treedetection_tpu.vector import (
    clip_polygon_box, ensure_closed, points_in_polygon, polygon_area,
    polygon_bounds, polygon_centroid, polygon_intersects, polygon_iou,
    polygon_within, rasterize_polygon, read_gpkg, read_shapefile,
    simplify_polygon, write_gpkg, PolygonSet,
)
from treedetection_tpu.vector.rasterize import polygon_raster_stats
from treedetection_tpu.vector.geojson import read_geojson, write_geojson


def square(x0, y0, size):
    return np.array([[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]],
                    dtype=np.float64)


def circle(cx, cy, r, n=64):
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(a), cy + r * np.sin(a)], axis=1)


class TestPolygonMath:
    def test_area_square(self):
        assert polygon_area(square(0, 0, 10)) == 100.0

    def test_area_circle(self):
        a = polygon_area(circle(5, 5, 3, n=720))
        assert abs(a - math.pi * 9) < 0.01

    def test_centroid(self):
        cx, cy = polygon_centroid(square(2, 4, 10))
        assert np.isclose(cx, 7) and np.isclose(cy, 9)

    def test_points_in_polygon(self):
        poly = circle(0, 0, 5)
        pts = np.array([[0, 0], [4.9, 0], [5.2, 0], [3, 3], [4, 4]])
        inside = points_in_polygon(pts, poly)
        assert inside.tolist() == [True, True, False, True, False]

    def test_simplify_preserves_shape(self):
        # a square with many redundant collinear vertices
        n = 50
        side = np.linspace(0, 10, n)
        ring = np.vstack([
            np.stack([side, np.zeros(n)], axis=1),
            np.stack([np.full(n, 10.0), side], axis=1),
            np.stack([side[::-1], np.full(n, 10.0)], axis=1),
            np.stack([np.zeros(n), side[::-1]], axis=1),
        ])
        simp = simplify_polygon(ring, 0.1)
        assert len(simp) <= 10
        assert abs(polygon_area(simp) - 100.0) < 1.0

    def test_simplify_tolerance_zero_is_noop(self):
        p = circle(0, 0, 5, 32)
        out = simplify_polygon(p, 0.0)
        assert len(out) == 33  # closed

    def test_clip_box(self):
        clipped = clip_polygon_box(square(0, 0, 10), (5, 5, 20, 20))
        assert abs(polygon_area(clipped) - 25.0) < 1e-9

    def test_clip_disjoint(self):
        clipped = clip_polygon_box(square(0, 0, 2), (5, 5, 8, 8))
        assert polygon_area(clipped) == 0.0

    def test_intersects_and_within(self):
        a, b = square(0, 0, 10), square(5, 5, 10)
        c = square(2, 2, 3)
        d = square(20, 20, 3)
        assert polygon_intersects(a, b)
        assert not polygon_intersects(a, d)
        assert polygon_within(c, a)
        assert not polygon_within(b, a)

    def test_iou(self):
        a, b = square(0, 0, 10), square(5, 0, 10)
        # overlap 50, union 150 -> 1/3
        assert abs(polygon_iou(a, b) - 1 / 3) < 0.01
        assert polygon_iou(a, square(50, 50, 2)) == 0.0
        assert abs(polygon_iou(a, a) - 1.0) < 1e-6

    def test_polygon_set_roundtrip(self):
        polys = [square(0, 0, 5), circle(10, 10, 2, 16), square(1, 1, 1)]
        ps = PolygonSet.from_list(polys)
        assert ps.coords.shape[0] == 3
        back = ps.to_list()
        for orig, rt in zip(polys, back):
            assert np.allclose(orig, rt)
        b = ps.bounds()
        assert np.allclose(b[0], [0, 0, 5, 5])


class TestRasterize:
    def test_square_coverage(self):
        t = Affine.from_origin(0, 100, 1.0, 1.0)
        mask = rasterize_polygon(square(10, 60, 20), t, (100, 100))
        assert mask.sum() == 400
        # correct placement: y=60..80 -> rows 20..40
        assert mask[25, 15] and not mask[25, 35]

    def test_circle_coverage(self):
        t = Affine.from_origin(0, 100, 0.5, 0.5)
        mask = rasterize_polygon(circle(25, 50, 10, 256), t, (200, 200))
        area = mask.sum() * 0.25
        assert abs(area - math.pi * 100) < 5

    def test_stats(self):
        t = Affine.from_origin(0, 50, 1.0, 1.0)
        raster = np.zeros((50, 50), dtype=np.float32)
        raster[10, 10] = 42.0  # geo x=10.5, y=39.5
        stats = polygon_raster_stats(square(5, 30, 15), raster, t)
        assert stats["max"] == 42.0
        assert abs(stats["argmax_xy"][0] - 10.5) < 1e-6
        assert abs(stats["argmax_xy"][1] - 39.5) < 1e-6
        assert stats["count"] >= 200


class TestGpkg:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "out.gpkg")
        geoms = [square(0, 0, 10), circle(100, 100, 5, 32)]
        props = [{"Confidence_score": 0.9, "poly_id": 1, "Area": 100.0},
                 {"Confidence_score": 0.5, "poly_id": 2, "Area": 78.5}]
        write_gpkg(p, geoms, props, srs_id=25832)
        rgeoms, rprops, srs = read_gpkg(p)
        assert srs == 25832
        assert len(rgeoms) == 2
        assert np.allclose(ensure_closed(geoms[0]), rgeoms[0][0][0])
        assert rprops[0]["poly_id"] == 1
        assert abs(rprops[1]["Area"] - 78.5) < 1e-9

    def test_multipolygon(self, tmp_path):
        p = str(tmp_path / "mp.gpkg")
        mp = [[square(0, 0, 5)], [square(20, 20, 5)]]  # multipolygon: 2 parts
        write_gpkg(p, [mp], [{"name": "two"}])
        rgeoms, rprops, _ = read_gpkg(p)
        assert len(rgeoms[0]) == 2
        assert rprops[0]["name"] == "two"

    def test_empty(self, tmp_path):
        p = str(tmp_path / "empty.gpkg")
        write_gpkg(p, [], [])
        rgeoms, rprops, _ = read_gpkg(p)
        assert rgeoms == [] and rprops == []


class TestShapefile:
    def test_read_handcrafted(self, tmp_path):
        # build a minimal single-polygon shapefile by hand (CW exterior ring)
        ring = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], dtype=np.float64)
        content = struct.pack("<i", 5)
        content += struct.pack("<4d", 0, 0, 10, 10)
        content += struct.pack("<ii", 1, len(ring))
        content += struct.pack("<i", 0)
        content += ring.astype("<f8").tobytes()
        record = struct.pack(">ii", 1, len(content) // 2) + content
        header = struct.pack(">i", 9994) + b"\0" * 20
        header += struct.pack(">i", (100 + len(record)) // 2)
        header += struct.pack("<ii", 1000, 5)
        header += struct.pack("<8d", 0, 0, 10, 10, 0, 0, 0, 0)
        path = tmp_path / "test.shp"
        path.write_bytes(header + record)
        geoms, props = read_shapefile(str(path))
        assert len(geoms) == 1
        assert abs(polygon_area(geoms[0][0][0]) - 100.0) < 1e-9


class TestGeoJson:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "f.geojson")
        write_geojson(p, [square(0, 0, 4)], [{"score": 0.7}], crs_epsg=25832)
        geoms, props = read_geojson(p)
        assert len(geoms) == 1
        assert abs(polygon_area(geoms[0][0][0]) - 16.0) < 1e-9
        assert props[0]["score"] == 0.7


class TestExactPolygonIoU:
    def test_squares_exact(self):
        from treedetection_tpu.vector.polygon import (
            polygon_intersection_area, polygon_iou_exact)
        a = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.]])
        b = a + [5.0, 5.0]
        assert polygon_intersection_area(a, b) == pytest.approx(25.0)
        assert polygon_iou_exact(a, b) == pytest.approx(25.0 / 175.0)
        # disjoint and identical
        assert polygon_iou_exact(a, a + [20.0, 0.0]) == 0.0
        assert polygon_iou_exact(a, a) == pytest.approx(1.0)

    def test_concave_exact(self):
        from treedetection_tpu.vector.polygon import polygon_intersection_area
        # L-shape: 10x10 square minus its top-right 5x5 quadrant
        l_shape = np.array([[0., 0.], [10., 0.], [10., 5.], [5., 5.],
                            [5., 10.], [0., 10.]])
        box = np.array([[4., 4.], [12., 4.], [12., 12.], [4., 12.]])
        # overlap = ([4,10]x[4,5]) + ([4,5]x[5,10]) = 6 + 5 = 11
        assert polygon_intersection_area(l_shape, box) == pytest.approx(11.0)
        # clockwise input gives the same area
        assert polygon_intersection_area(l_shape[::-1], box) == pytest.approx(11.0)

    def test_exact_matches_rasterized(self, rng):
        from treedetection_tpu.vector.polygon import (
            polygon_iou, polygon_iou_exact)
        for seed in range(5):
            r = np.random.default_rng(seed)
            def blob(cx, cy):
                ang = np.sort(r.uniform(0, 2 * np.pi, 12))
                rad = r.uniform(3, 8, 12)
                return np.stack([cx + rad * np.cos(ang),
                                 cy + rad * np.sin(ang)], 1)
            a, b = blob(0, 0), blob(3, 2)
            exact = polygon_iou_exact(a, b)
            approx = polygon_iou(a, b)
            assert abs(exact - approx) < 0.01, (seed, exact, approx)

    def test_greedy_match_reports_exact(self):
        from treedetection_tpu.eval.scores import greedy_iou_match
        a = np.array([[0., 0.], [10., 0.], [10., 10.], [0., 10.]])
        b = a + [1.0, 0.0]  # IoU = 90/110
        matches, up, ug = greedy_iou_match([a], [b], iou_threshold=0.5)
        assert len(matches) == 1
        assert matches[0][2] == pytest.approx(90.0 / 110.0, abs=1e-9)


class TestReviewRegressions:
    def test_burn_span_left_of_raster(self):
        """A polygon wholly left of the raster must burn NOTHING: the
        negative scanline span used to wrap around and fill the row."""
        from treedetection_tpu.geo import Affine
        from treedetection_tpu.vector.rasterize import rasterize_polygon
        t = Affine.from_origin(100.0, 100.0, 1.0, 1.0)
        poly = np.array([[80.0, 90.0], [90.0, 90.0], [90.0, 95.0],
                         [80.0, 95.0]])  # x in [80, 90] < raster x0=100
        mask = rasterize_polygon(poly, t, (20, 20))
        assert not mask.any()
        # and one OVERLAPPING the left edge burns only the interior columns
        poly2 = np.array([[90.0, 90.0], [105.0, 90.0], [105.0, 95.0],
                          [90.0, 95.0]])
        mask2 = rasterize_polygon(poly2, t, (20, 20))
        assert mask2[:, :5].any() and not mask2[:, 6:].any()

    def test_polygonset_keeps_pad_slot(self):
        """from_list must pad the LONGEST ring too (the device closing
        vertex goes into the pad slot, not over a real vertex)."""
        from treedetection_tpu.vector.polygon import PolygonSet
        tri = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
        ps = PolygonSet.from_list([tri])
        assert ps.coords.shape[1] >= len(tri) + 1
        assert np.isnan(ps.coords[0, len(tri), 0])

    def test_intersects_shared_edge_only(self):
        """Polygons sharing only a boundary edge intersect (shapely
        semantics, reference helpers.py:364)."""
        from treedetection_tpu.vector.polygon import (polygon_intersects,
                                                      polygon_within)
        a = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        b = a + np.array([1.0, 0.0])     # shares edge x=1
        c = a + np.array([2.5, 0.0])     # disjoint
        assert polygon_intersects(a, b)
        assert not polygon_intersects(a, c)
        assert not polygon_within(a, b)

    def test_raster_stats_argmax_skips_nan(self):
        from treedetection_tpu.geo import Affine
        from treedetection_tpu.vector.rasterize import polygon_raster_stats
        t = Affine.from_origin(0.0, 10.0, 1.0, 1.0)
        r = np.full((10, 10), 1.0, np.float32)
        r[5, 5] = np.nan          # nodata hole inside the polygon
        r[2, 2] = 7.0             # true max
        poly = np.array([[0.5, 0.5], [9.5, 0.5], [9.5, 9.5], [0.5, 9.5]])
        st = polygon_raster_stats(poly, r, t)
        assert st["max"] == 7.0
        gx, gy = st["argmax_xy"]
        assert (gx, gy) == (2.5, 7.5)   # pixel (2,2) center, NOT the NaN cell
