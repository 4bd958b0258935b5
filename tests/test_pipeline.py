"""End-to-end pipeline tests: stitching, postprocessing, fusion, and the full
process_files run on synthetic data with a tiny model."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from treedetection_tpu.geo import Affine, write_geotiff
from treedetection_tpu.vector import read_gpkg, write_gpkg
from treedetection_tpu import stitching


def square(x0, y0, size):
    return np.array([[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]],
                    dtype=np.float64)


def circle(cx, cy, r, n=24):
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(a), cy + r * np.sin(a)], axis=1)


def write_prediction_json(path, crowns_scores):
    data = [{"image_id": "x.tif", "category_id": 0, "score": s,
             "polygon_coords": [np.asarray(c).tolist()]}
            for c, s in crowns_scores]
    with open(path, "w") as fh:
        json.dump(data, fh)


class TestStitching:
    def test_filename_geoinfo(self):
        assert stitching.filename_geoinfo("324125317_412000_5317000_50_20_25832") \
            == (412000, 5317000, 50, 20, 25832)

    def test_shrunk_box(self):
        b = stitching.shrunk_tile_box("img_100_200_50_20_25832", shift=1)
        assert b == (81, 181, 169, 269)

    def test_stitch_filters_edge_crowns(self, tmp_path):
        tile_id = "img_100_200_50_20_25832"
        pred = tmp_path / f"Prediction_{tile_id}.json"
        inside = circle(125, 225, 5)
        edge = circle(82, 182, 5)  # pokes outside the shrunk box
        write_prediction_json(str(pred), [(inside, 0.9), (edge, 0.8)])
        crowns, scores = stitching.stitch_tile_file(str(pred), 0.2, shift=1)
        assert len(crowns) == 1
        assert scores == [0.9]

    def test_stitch_image_writes_gpkg(self, tmp_path):
        d = tmp_path / "img"
        d.mkdir()
        write_prediction_json(
            str(d / "Prediction_img_100_200_50_20_25832.json"),
            [(circle(125, 225, 5), 0.9)])
        write_prediction_json(
            str(d / "Prediction_img_150_200_50_20_25832.json"),
            [(circle(175, 225, 6), 0.7)])
        out = str(tmp_path / "img.gpkg")
        n = stitching.stitch_image(str(d), out)
        assert n == 2
        geoms, props, srs = read_gpkg(out)
        assert srs == 25832
        assert {round(p["Confidence_score"], 1) for p in props} == {0.9, 0.7}

    def test_eager_sink_matches_file_path(self, tmp_path):
        """The Predictor's in-memory stitch sink must produce a GPKG
        identical (same crowns, same order) to the file-based re-parse."""
        root = tmp_path / "pred"
        d = root / "img"
        d.mkdir(parents=True)
        rng = np.random.default_rng(3)
        for k, (tx, ty) in enumerate([(100, 200), (150, 200)]):
            tile_id = f"img_{tx}_{ty}_50_20_25832"
            crowns = []
            for c in range(5):
                ring = circle(tx + rng.uniform(-10, 60),
                              ty + rng.uniform(-10, 60),
                              rng.uniform(2, 6), n=40)
                crowns.append((ring, float(rng.uniform(0.3, 1.0))))
            write_prediction_json(str(d / f"Prediction_{tile_id}.json"), crowns)

        out_file = str(tmp_path / "file.gpkg")
        n_file = stitching.stitch_image(str(d), out_file, 0.2)

        # build the sink exactly as the Predictor does: per-tile stitch_rings
        # on the in-memory rings at flush time
        tiles = {}
        for f in sorted(d.glob("Prediction_*.json")):
            with open(f) as fh:
                data = json.load(fh)
            rings = [np.asarray(c["polygon_coords"][0], dtype=np.float64)
                     .reshape(-1, 2) for c in data]
            scores = [float(c["score"]) for c in data]
            tile_id = f.stem.replace("Prediction_", "")
            tiles[f.name] = stitching.stitch_rings(tile_id, rings, scores, 0.2)
        config = {"logger": None, "simplify_tolerance": 0.2,
                  "_stitch_cache": {
                      str(d): {"tolerance": 0.2, "tiles": tiles}}}
        outputs = stitching.process_and_stitch_predictions(
            config, str(root), ["img.tif"])
        assert os.path.exists(outputs[0])
        assert config["_stitch_cache"] == {}  # consumed

        g_file, p_file, srs_file = read_gpkg(out_file)
        g_mem, p_mem, srs_mem = read_gpkg(outputs[0])
        assert n_file == len(g_mem) > 0
        assert srs_file == srs_mem
        assert [p["Confidence_score"] for p in p_file] \
            == [p["Confidence_score"] for p in p_mem]
        for a, b in zip(g_file, g_mem):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eager_sink_tolerance_mismatch_falls_back(self, tmp_path):
        """A sink built under a different simplify tolerance is ignored —
        the file-based path re-stitches with the configured tolerance."""
        root = tmp_path / "pred"
        d = root / "img"
        d.mkdir(parents=True)
        write_prediction_json(
            str(d / "Prediction_img_100_200_50_20_25832.json"),
            [(circle(125, 225, 5, n=40), 0.9)])
        config = {"logger": None, "simplify_tolerance": 0.5,
                  "_stitch_cache": {
                      str(d): {"tolerance": 0.2,
                               "tiles": {"Prediction_img_100_200_50_20_25832"
                                         ".json": ([], [])}}}}
        outputs = stitching.process_and_stitch_predictions(
            config, str(root), ["img.tif"])
        geoms, _, _ = read_gpkg(outputs[0])
        assert len(geoms) == 1  # stale empty sink was NOT trusted

    def test_eager_sink_write_failure_falls_back(self, tmp_path, monkeypatch):
        """A cached-stitch write failure re-queues the image for file-based
        stitching — the tile JSONs are on disk, the image must not be lost."""
        root = tmp_path / "pred"
        d = root / "img"
        d.mkdir(parents=True)
        name = "Prediction_img_100_200_50_20_25832.json"
        write_prediction_json(str(d / name), [(circle(125, 225, 5, n=40), 0.9)])
        tiles = {name: stitching.stitch_tile_file(str(d / name), 0.2)}
        monkeypatch.setattr(stitching, "stitch_image_cached",
                            lambda *a, **kw: (_ for _ in ()).throw(
                                ValueError("bad write")))
        config = {"logger": None, "simplify_tolerance": 0.2,
                  "_stitch_cache": {str(d): {"tolerance": 0.2,
                                             "tiles": tiles}}}
        outputs = stitching.process_and_stitch_predictions(
            config, str(root), ["img.tif"])
        geoms, _, _ = read_gpkg(outputs[0])
        assert len(geoms) == 1  # file path rescued the image

    def test_eager_sink_stale_dir_falls_back(self, tmp_path):
        """A sink that does not cover every Prediction_*.json on disk (stale
        files from a prior run) is distrusted — the file path gathers ALL
        tile files, matching the glob semantics."""
        root = tmp_path / "pred"
        d = root / "img"
        d.mkdir(parents=True)
        for tx in (100, 150):
            write_prediction_json(
                str(d / f"Prediction_img_{tx}_200_50_20_25832.json"),
                [(circle(tx + 25, 225, 5, n=40), 0.9)])
        # sink knows only ONE of the two files on disk
        config = {"logger": None, "simplify_tolerance": 0.2,
                  "_stitch_cache": {
                      str(d): {"tolerance": 0.2,
                               "tiles": {"Prediction_img_100_200_50_20_25832"
                                         ".json": ([], [])}}}}
        outputs = stitching.process_and_stitch_predictions(
            config, str(root), ["img.tif"])
        geoms, _, _ = read_gpkg(outputs[0])
        assert len(geoms) == 2  # both tiles stitched via the file path

    def test_stitch_stage_survives_one_bad_image(self, tmp_path, monkeypatch):
        """One failing image folder must not abort the stage or lose the
        manifest for completed stems (keep-alive parity with the reference's
        per-item try/except)."""
        from treedetection_tpu.recoveries import load_stitching_recovery_data
        root = tmp_path / "pred"
        for stem in ("good", "bad"):
            d = root / stem
            d.mkdir(parents=True)
            write_prediction_json(
                str(d / f"Prediction_{stem}_100_200_50_20_25832.json"),
                [(circle(125, 225, 5), 0.9)])
        real = stitching.stitch_image

        def flaky(pred_dir, out_gpkg, *a, **kw):
            if "bad" in pred_dir:
                raise OSError("disk full")
            return real(pred_dir, out_gpkg, *a, **kw)

        monkeypatch.setattr(stitching, "stitch_image", flaky)
        outputs = stitching.process_and_stitch_predictions(
            {"logger": None}, str(root), ["good.tif", "bad.tif"])
        assert len(outputs) == 2
        assert os.path.exists(os.path.join(str(root), "good.gpkg"))
        assert set(load_stitching_recovery_data(str(root))) == {"good"}


class TestPostprocessing:
    def _config(self, **over):
        cfg = {"confidence_threshold": 0.3, "containment_threshold": 0.9,
               "height_threshold": 3, "ndvi_mean_threshold": 0.1,
               "ndvi_var_threshold": 0.1, "iou_threshold": 0.5,
               "area_threshold": 1, "ndvi_scaling_factor": 1.0,
               "height_scaling_factor": 1.0, "use_overlap": False,
               "tile_width": 50, "tile_height": 50, "buffer": 20,
               "overlapping_tiles_width": 3, "overlapping_tiles_height": 3,
               "logger": None}
        cfg.update(over)
        return cfg

    def test_confidence_and_area_filters(self):
        from treedetection_tpu.postprocessing import process_crowns
        # squares: invariant under the reference's 2 m simplify
        crowns = [square(6, 6, 8), square(26, 26, 8), square(50, 50, 0.5)]
        scores = np.array([0.9, 0.1, 0.9], dtype=np.float32)
        geoms, props = process_crowns(crowns, scores, self._config(),
                                      None, None, None, None, None)
        # crown 1 dropped (low confidence), crown 2 dropped (area < 1 m^2)
        assert len(geoms) == 1
        assert props[0]["Confidence_score"] == pytest.approx(0.9)
        assert props[0]["Area"] == pytest.approx(64.0, rel=1e-3)
        assert props[0]["Diameter"] == pytest.approx(2 * np.sqrt(64 / np.pi), rel=1e-3)

    def test_utm_magnitude_coordinates(self):
        """Real-world UTM coords (~5.3e6 m northing) must survive the float32
        device math: a regression for the local-frame shift (without it,
        shoelace/stat cancellation at that magnitude reported garbage areas
        and the example pipeline filtered every crown)."""
        from treedetection_tpu.postprocessing import process_crowns
        ox, oy = 412000.0, 5317000.0
        t = Affine.from_origin(ox, oy + 100, 1.0, 1.0)
        height = np.full((100, 100), 10.0, dtype=np.float32)
        crowns = [square(ox + 6, oy + 6, 8), square(ox + 30, oy + 30, 9)]
        scores = np.array([0.9, 0.8], dtype=np.float32)
        geoms, props = process_crowns(
            crowns, scores, self._config(), height, t, None, None,
            (ox, oy, ox + 100, oy + 100))
        assert len(geoms) == 2
        assert props[0]["Area"] == pytest.approx(64.0, rel=1e-3)
        assert props[1]["Area"] == pytest.approx(81.0, rel=1e-3)
        assert props[0]["TreeHeight"] == pytest.approx(10.0, abs=0.1)
        # centroid back in the global frame
        assert f"'x': {ox + 10.0}" in props[0]["Centroid"]

    def test_height_gate(self):
        from treedetection_tpu.postprocessing import process_crowns
        t = Affine.from_origin(0, 100, 1.0, 1.0)
        height = np.zeros((100, 100), dtype=np.float32)
        height[10:30, 10:30] = 10.0  # tall region around (10..30, y 70..90)
        crowns = [circle(20, 80, 5), circle(70, 20, 5)]  # tall vs flat ground
        scores = np.array([0.9, 0.9], dtype=np.float32)
        geoms, props = process_crowns(crowns, scores, self._config(),
                                      height, t, None, None, None)
        assert len(geoms) == 1
        assert props[0]["TreeHeight"] == pytest.approx(10.0, abs=0.5)

    def test_ndvi_gate(self):
        from treedetection_tpu.postprocessing import process_crowns
        t = Affine.from_origin(0, 100, 1.0, 1.0)
        ndvi = np.full((100, 100), 0.02, dtype=np.float32)  # barren
        ndvi[60:95, 5:40] = 0.5  # vegetated block around x 5..40, y 5..40
        crowns = [circle(20, 20, 8), circle(70, 70, 8)]
        scores = np.array([0.9, 0.9], dtype=np.float32)
        geoms, props = process_crowns(crowns, scores, self._config(),
                                      None, None, ndvi, t, None)
        assert len(geoms) == 1  # barren crown dropped

    def test_iou_dedupe_keeps_best(self):
        from treedetection_tpu.postprocessing import process_crowns
        a = circle(20, 20, 5)
        b = circle(20.5, 20, 5)  # near-duplicate
        c = circle(60, 60, 5)
        scores = np.array([0.7, 0.95, 0.8], dtype=np.float32)
        geoms, props = process_crowns([a, b, c], scores,
                                      self._config(iou_threshold=0.5),
                                      None, None, None, None, None)
        kept_scores = sorted(p["Confidence_score"] for p in props)
        assert kept_scores == pytest.approx([0.8, 0.95])

    def test_containment_drops_umbrella(self):
        from treedetection_tpu.postprocessing import process_crowns
        big = square(0, 0, 40)
        inner = [circle(8, 8, 3), circle(20, 20, 3), circle(32, 32, 3)]
        scores = np.array([0.9, 0.9, 0.9, 0.9], dtype=np.float32)
        geoms, props = process_crowns([big] + inner, scores, self._config(),
                                      None, None, None, None, None)
        # big contains 3 -> dropped; inner kept
        assert len(geoms) == 3
        assert all(p["Area"] < 100 for p in props)

    def test_border_exclusion(self):
        from treedetection_tpu.postprocessing import border_overlap_exclusion
        cfg = self._config(use_overlap=True)
        bounds = np.array([
            [0.5, 50, 8, 58],      # near left border
            [500, 500, 520, 520],  # interior
            [40, 40, 60, 60],      # inside left overlap band (half_w = 135)
        ])
        keep = border_overlap_exclusion(bounds, (0, 0, 1000, 1000), cfg,
                                        is_merged_strip=False)
        # near-border dropped, interior kept, overlap-band (half_w=135) dropped
        assert keep.tolist() == [False, True, False]
        keep2 = border_overlap_exclusion(
            np.array([[400, 400, 420, 420]]), (0, 0, 1000, 1000), cfg, False)
        assert keep2.tolist() == [True]


class TestFusion:
    def test_fuse_selects_by_outline(self, tmp_path):
        from treedetection_tpu.fusion import fuse_predictions
        from treedetection_tpu.vector.geojson import write_geojson
        outline = str(tmp_path / "forest.geojson")
        write_geojson(outline, [square(0, 0, 100)], [{}], crs_epsg=25832)

        urban = str(tmp_path / "img_urban.gpkg")
        forest = str(tmp_path / "img_forest.gpkg")
        # forest model: one crown inside forest (keep), one far outside (drop)
        write_gpkg(forest, [circle(50, 50, 5), circle(500, 500, 5)],
                   [{"Confidence_score": 0.9}, {"Confidence_score": 0.8}])
        # urban model: one crown inside forest (drop), one outside (keep)
        write_gpkg(urban, [circle(50, 50, 4), circle(200, 200, 4)],
                   [{"Confidence_score": 0.7}, {"Confidence_score": 0.6}])
        cfg = {"logger": None}
        outs = fuse_predictions(cfg, [urban], [forest], outline,
                                str(tmp_path / "fused"))
        geoms, props, _ = read_gpkg(outs[0])
        scores = sorted(round(p["Confidence_score"], 1) for p in props)
        assert scores == [0.6, 0.9]

    def test_outline_island_inside_crown_intersects(self):
        """An outline island strictly inside the crown must count as an
        intersection even though no crown vertex (nor the centroid) touches
        it (reference GEOS ``intersects`` semantics, helpers.py:804-812)."""
        from treedetection_tpu.fusion import OutlineMask
        island = square(25, 5, 10)  # off-center: crown centroid (20,20) misses
        mask = OutlineMask([island], (0, 0, 40, 40), resolution=0.5)
        crown = square(0, 0, 40)
        intersects, within = mask.polygon_relation(crown)
        assert intersects is True
        assert within is False

    def test_crown_spanning_outline_gap_not_within(self):
        """All crown vertices + centroid inside the outline union, but the
        interior spans an uncovered strip -> NOT within."""
        from treedetection_tpu.fusion import OutlineMask
        left = square(0, 0, 20)
        right = square(26, 0, 34)  # gap x in (20, 26); crown centroid at x=30
        mask = OutlineMask([left, right], (0, 0, 60, 40), resolution=0.5)
        crown = np.array([[5.0, 5.0], [55.0, 5.0], [55.0, 35.0], [5.0, 35.0],
                          [5.0, 5.0]])
        intersects, within = mask.polygon_relation(crown)
        assert intersects is True
        assert within is False
        # sanity: a crown fully under one square IS within
        inner = square(4, 4, 12)
        assert mask.polygon_relation(inner) == (True, True)

    def test_exclude_outlines(self, tmp_path):
        from treedetection_tpu.fusion import exclude_outlines
        from treedetection_tpu.vector.geojson import write_geojson
        water = str(tmp_path / "water.geojson")
        write_geojson(water, [square(0, 0, 50)], [{}])
        gp = str(tmp_path / "crowns.gpkg")
        write_gpkg(gp, [circle(25, 25, 5), circle(100, 100, 5)],
                   [{"Confidence_score": 0.9}, {"Confidence_score": 0.8}])
        exclude_outlines([gp], [water])
        geoms, props, _ = read_gpkg(gp)
        assert len(geoms) == 1
        assert props[0]["Confidence_score"] == pytest.approx(0.8)


@pytest.mark.slow
class TestEndToEnd:
    def test_process_files_runs(self, tmp_path, rng):
        """Full pipeline on a synthetic 100 m tile with a tiny random model.

        Random weights produce arbitrary detections; the contract under test
        is that every stage runs, intermediates appear with the reference
        naming, and the final processed GPKG is written.
        """
        t = Affine.from_origin(412000.0, 5318000.0, 0.5, 0.5)
        rgbi = rng.integers(0, 255, (200, 200, 4), dtype=np.uint8)
        ndsm = (rng.random((200, 200)) * 20).astype(np.float32)
        (tmp_path / "rgb").mkdir()
        (tmp_path / "nDSM").mkdir()
        write_geotiff(str(tmp_path / "rgb" / "324125317.tif"), rgbi, t, crs=25832)
        write_geotiff(str(tmp_path / "nDSM" / "324125317.tif"), ndsm, t,
                      crs=25832, nodata=-9999.0)
        model_file = tmp_path / "model.ckpt"
        model_file.write_text("placeholder")  # random-init path

        cfg_yaml = {
            "image_directory": "rgb",
            "height_data_path": "nDSM",
            "combined_model": "model.ckpt",
            "output_directory": "out",
            "tiles_path": "tiles",
            "tile_width": 50, "tile_height": 50, "buffer": 10,
            "batch_size": 2,
            "use_overlap": False,
            "model_depth": 50, "model_input_size": 128,
            "rpn_pre_nms_topk": 100, "rpn_post_nms_topk": 50,
            "max_detections": 10,
            "ndvi_mean_threshold": -2.0, "ndvi_var_threshold": 99.0,
            "height_threshold": 0,
            "keep_intermediate": True,
            "mixed_precision": False,
        }
        cfg_path = tmp_path / "config.yml"
        cfg_path.write_text(yaml.safe_dump(cfg_yaml))

        from treedetection_tpu.config import get_config, Config
        from treedetection_tpu.detection import process_files
        Config.reset()
        config, _ = get_config(str(cfg_path))
        outputs = process_files(config)

        tiles_json = tmp_path / "tiles" / "324125317.json"
        assert tiles_json.exists()
        meta = json.loads(tiles_json.read_text())
        assert len(meta) == 4  # 100m x 100m -> 2x2 grid of 50m tiles

        pred_dir = tmp_path / "out" / "predictions" / "324125317"
        assert len(list(pred_dir.glob("Prediction_*.json"))) == 4
        stitched = tmp_path / "out" / "predictions" / "324125317.gpkg"
        assert stitched.exists()
        processed = tmp_path / "out" / "processed_324125317.gpkg"
        assert processed.exists()
        geoms, props, srs = read_gpkg(str(processed))
        assert srs == 25832
        # process_files must RETURN the final layer paths
        assert outputs == [str(processed)]


@pytest.mark.slow
class TestTwoModelEndToEnd:
    def test_two_model_routing_and_fusion(self, tmp_path, rng):
        """Urban/forest two-model branch: exclude-flag routing, per-model
        stitching, and outline fusion (reference detection.py:143-219)."""
        from treedetection_tpu.vector.geojson import write_geojson

        t = Affine.from_origin(412000.0, 5318000.0, 0.5, 0.5)
        rgbi = rng.integers(0, 255, (400, 400, 4), dtype=np.uint8)
        ndsm = (rng.random((400, 400)) * 20).astype(np.float32)
        (tmp_path / "rgb").mkdir()
        (tmp_path / "nDSM").mkdir()
        write_geotiff(str(tmp_path / "rgb" / "324125317.tif"), rgbi, t, crs=25832)
        write_geotiff(str(tmp_path / "nDSM" / "324125317.tif"), ndsm, t,
                      crs=25832, nodata=-9999.0)
        # forest outline: the west half (+margins) of the 200 m image, so
        # west tiles are forest-only and east tiles urban-only even with
        # their 10 m buffers
        outline = tmp_path / "forest.geojson"
        write_geojson(str(outline),
                      [np.array([[411980., 5317780.], [412100., 5317780.],
                                 [412100., 5318020.], [411980., 5318020.]])],
                      [{}], crs_epsg=25832)
        for name in ("urban.ckpt", "forest.ckpt"):
            (tmp_path / name).write_text("x")  # random-init fallbacks

        cfg_yaml = {
            "image_directory": "rgb", "height_data_path": "nDSM",
            "urban_model": "urban.ckpt", "forrest_model": "forest.ckpt",
            "forrest_outline": "forest.geojson",
            "output_directory": "out", "tiles_path": "tiles",
            "tile_width": 50, "tile_height": 50, "buffer": 10,
            "batch_size": 2, "use_overlap": False,
            "model_depth": 50, "model_input_size": 128,
            "rpn_pre_nms_topk": 100, "rpn_post_nms_topk": 50,
            "max_detections": 10, "mixed_precision": False,
            "keep_intermediate": True,
        }
        cfg_path = tmp_path / "config.yml"
        cfg_path.write_text(yaml.safe_dump(cfg_yaml))
        from treedetection_tpu.config import get_config, Config
        from treedetection_tpu.detection import preprocess_files, predict_tiles
        Config.reset()
        config, _ = get_config(str(cfg_path))
        preprocess_files(config)

        # tiles must carry forest/urban flags from the outline
        meta = json.loads((tmp_path / "tiles" / "324125317.json").read_text())
        flags = {(m["only_forest"], m["only_urban"]) for m in meta.values()}
        assert (True, False) in flags or (False, False) in flags
        assert (False, True) in flags  # east tiles are urban-only

        outputs = predict_tiles(config)
        # per-model prediction folders + fused per-image output exist
        assert (tmp_path / "out" / "predictions" / "urban").is_dir()
        assert (tmp_path / "out" / "predictions" / "forest").is_dir()
        assert outputs and os.path.exists(outputs[0])


class TestBandPredrop:
    def test_band_predrop_equivalent_to_border_exclusion(self, tmp_path):
        """The predictor's overlap-band pre-drop (skip mask->polygon work for
        detections whose BOX is entirely inside the border band) must not
        change what survives postprocess's exact border_overlap_exclusion:
        certain drops only, ambiguous band-crossing boxes keep processing."""
        import json
        import types
        from treedetection_tpu.geo import Affine
        from treedetection_tpu.prediction import Predictor
        from treedetection_tpu.postprocessing import border_overlap_exclusion

        # disk blob mask (28x28 uint8) -> polygon roughly filling the box
        mask = np.zeros((28, 28), np.uint8)
        yy, xx = np.mgrid[:28, :28]
        mask[((yy - 14) ** 2 + (xx - 14) ** 2) < 144] = 220
        # raster 1000x1000 m at origin (0, 0); band half-width
        # (50+40)*3/2 = 135 m.  Tile window at geo (0..100, 900..1000)
        # (top-left corner of the raster), pixel->geo:
        tr = Affine(1.0, 0, 0.0, 0, -1.0, 1000.0)
        item = {"transform": list(tr), "crs": 25832, "tile_id": "t_0_900"}
        boxes = np.array([
            # px y 400-450 -> geo y 550-600 (y-interior); x 10-40 is fully
            # inside the left band -> certain drop
            [10, 400, 40, 450],
            [200, 200, 260, 260],  # geo x 200-260, y 740-800: interior
            # x 120-180 crosses the x=135 band edge (y-interior) -> ambiguous
            [120, 400, 180, 450],
        ], dtype=np.float32)
        scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
        masks = np.stack([mask] * 3)
        valid = np.ones(3, bool)
        cfg = {"use_overlap": True, "tile_width": 50, "tile_height": 50,
               "buffer": 20, "overlapping_tiles_width": 3,
               "overlapping_tiles_height": 3}

        def run(band):
            ns = types.SimpleNamespace(_stitch_acc=None, logger=None,
                                       config=cfg, _band_keep=band)
            out = tmp_path / ("band" if band else "noband")
            out.mkdir(exist_ok=True)
            Predictor._write_tile_predictions(
                ns, item, boxes, scores, masks, valid, (1000, 1000), 1.0,
                "img.tif", str(out))
            with open(out / "Prediction_t_0_900.json") as fh:
                return json.load(fh)

        # band thresholds for raster bounds (0, 0, 1000, 1000), half 135
        band = (135.0, 135.0, 865.0, 865.0)
        with_band = run(band)
        without = run(None)
        assert len(without) == 3
        assert len(with_band) == 2          # certain in-band drop skipped
        kept_scores = {round(e["score"], 2) for e in with_band}
        assert kept_scores == {0.8, 0.7}    # interior + ambiguous survive

        def survivors(evals):
            keep = set()
            for e in evals:
                poly = np.asarray(e["polygon_coords"][0])
                b = np.array([[poly[:, 0].min(), poly[:, 1].min(),
                               poly[:, 0].max(), poly[:, 1].max()]])
                k = border_overlap_exclusion(b, (0, 0, 1000, 1000), cfg,
                                             is_merged_strip=False)
                if k[0]:
                    keep.add(round(e["score"], 2))
            return keep

        # the exact exclusion yields the same final set either way
        assert survivors(with_band) == survivors(without)

    def test_band_predrop_requires_strict_config_keys(self):
        """ADVICE r4 (medium): the pre-drop must NOT run with guessed
        defaults — border_overlap_exclusion reads the keys strictly, so a
        config missing any of them disables the pre-drop instead of
        silently dropping crowns with a 135 m guess."""
        from treedetection_tpu.prediction import (
            BAND_PREDROP_KEYS, band_predrop_bounds)
        full = {"use_overlap": True, "tile_width": 50, "tile_height": 50,
                "buffer": 20, "overlapping_tiles_width": 3,
                "overlapping_tiles_height": 3}
        b = (0.0, 0.0, 1000.0, 1000.0)
        assert band_predrop_bounds(full, "x.tif", b) == (
            135.0, 135.0, 865.0, 865.0)
        for k in BAND_PREDROP_KEYS:
            partial = {kk: v for kk, v in full.items() if kk != k}
            assert band_predrop_bounds(partial, "x.tif", b) is None, k
        # merged seam strips re-predict the band: never pre-drop there
        strip_cfg = dict(full, image_merged_regex=r"(\d+)_(\d+)_.*\.tif")
        assert band_predrop_bounds(strip_cfg, "12_34_56_78_s.tif", b) is None
        assert band_predrop_bounds(strip_cfg, "x.tif", b) is not None
        for off in ("use_overlap", "band_predrop"):
            assert band_predrop_bounds(dict(full, **{off: False}),
                                       "x.tif", b) is None

    def test_band_sidecar_runs_exclusion_without_rasters(self, tmp_path):
        """ADVICE r4 (medium): when no height/RGBI raster matches a stitched
        layer, postprocess must STILL apply the border/overlap exclusion
        using the bounds the predictor recorded in band_predrop.json —
        otherwise the pre-drop deletes band crowns the final output should
        only lose when the exclusion actually runs."""
        import json
        from treedetection_tpu.postprocessing import process_single_file
        from treedetection_tpu.vector import read_gpkg, write_gpkg

        def square(x, y, s):
            return np.array([[x, y], [x + s, y], [x + s, y + s], [x, y + s]],
                            dtype=np.float64)

        # raster bounds (0, 0, 1000, 1000), band half-width 135 m
        crowns = [square(400, 400, 10),   # interior: kept
                  square(30, 400, 10)]    # inside left band: excluded
        props = [{"Confidence_score": 0.9}, {"Confidence_score": 0.9}]
        gpkg = tmp_path / "img.gpkg"
        write_gpkg(str(gpkg), crowns, props, srs_id=25832)
        cfg = {"use_overlap": True, "tile_width": 50, "tile_height": 50,
               "buffer": 20, "overlapping_tiles_width": 3,
               "overlapping_tiles_height": 3, "height_threshold": 0,
               "confidence_threshold": 0.3}
        out = tmp_path / "processed_img.gpkg"

        # no sidecar, no rasters -> exclusion skipped, both crowns kept
        n = process_single_file(str(gpkg), cfg, None, None, str(out))
        assert n == 2

        # sidecar present (predictor pre-dropped with these bounds) ->
        # the exclusion runs from the recorded bounds
        side_dir = tmp_path / "img"
        side_dir.mkdir()
        (side_dir / "band_predrop.json").write_text(
            json.dumps({"bounds": [0.0, 0.0, 1000.0, 1000.0]}))
        n = process_single_file(str(gpkg), cfg, None, None, str(out))
        assert n == 1
        geoms, _, _ = read_gpkg(str(out))
        assert len(geoms) == 1
        assert np.asarray(geoms[0][0][0])[:, 0].min() >= 135.0


class TestPredictorCache:
    def test_get_predictor_single_construction_under_race(self, monkeypatch):
        """The async compile-warmup thread and the predict stage race into
        ``get_predictor``; construction must happen exactly once (two
        instances would double-load the checkpoint and issue two concurrent
        device compiles, wedging single-tenant backends)."""
        import threading
        import time
        from treedetection_tpu import prediction as pred_mod

        built = []

        class SlowStub:
            def __init__(self, config, model_path):
                time.sleep(0.05)  # widen the race window
                built.append(self)

        monkeypatch.setattr(pred_mod, "Predictor", SlowStub)
        config = {}
        results = [None, None]

        def grab(i):
            results[i] = pred_mod.get_predictor(config, "m.npz")

        threads = [threading.Thread(target=grab, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(built) == 1
        assert results[0] is results[1] is built[0]

    def test_global_jit_reuse_across_predictors(self):
        """Two Predictors with the same static spec (e.g. successive
        process_files runs in one driver process, or bench's warm pass)
        must share ONE jit object — the compiled program is weight-agnostic
        (params ride as arguments), so re-tracing per run wastes the 3.7 s
        executable load a warm pass would otherwise pay."""
        import numpy as np
        from treedetection_tpu import prediction as pred_mod

        cfg = {"model_depth": 50, "model_input_size": 128,
               "rpn_pre_nms_topk": 64, "rpn_post_nms_topk": 32,
               "max_detections": 8, "mixed_precision": False,
               "batch_size": 1}
        p1 = pred_mod.Predictor(dict(cfg), None)
        p2 = pred_mod.Predictor(dict(cfg), None)
        fn1, scale1 = p1._get_forward(96)
        fn2, scale2 = p2._get_forward(96)
        assert fn1.func is fn2.func          # shared jitted program
        assert fn1.args[0] is p1.params      # per-predictor weights
        assert scale1 == scale2
        # different static spec -> different program
        cfg3 = dict(cfg, model_input_size=160)
        p3 = pred_mod.Predictor(cfg3, None)
        fn3, _ = p3._get_forward(96)
        assert fn3.func is not fn1.func
        # the shared program actually runs with either predictor's weights
        out = fn1(np.zeros((1, 96, 96, 3), dtype=np.uint8))
        assert np.asarray(out).shape[0] == 1


@pytest.mark.slow
class TestTrainedCheckpointEndToEnd:
    """process_files with the shipped trained checkpoint produces crowns.

    The synthetic-random-weights e2e above asserts structure only (random
    weights detect nothing meaningful); this test loads the committed
    example checkpoint (R50, trained at 90 m content -> 1024 px, i.e.
    0.088 m per model pixel) on a crown-dense 24 m crop of the bundled
    sample at the SAME effective scale (22 m content -> 256 px) and asserts
    the processed GPKG contains real detections with tree properties.
    """

    def test_processed_crowns_nonempty(self, tmp_path):
        repo = Path(__file__).resolve().parents[1]
        ckpt = repo / "example" / "data" / "model_full.npz"
        rgb_src = repo / "example" / "data" / "rgb" / "324125317.tif"
        nds_src = repo / "example" / "data" / "nDSM" / "324125317.tif"
        if not (ckpt.exists() and rgb_src.exists() and nds_src.exists()):
            pytest.skip("example checkpoint/sample data not present")

        from treedetection_tpu.geo import GeoTiff

        # densest 24 m window of the example run's stitched crowns
        x0, y0, W = 412896.0, 5317288.0, 24.0
        arr_rgb, t_rgb = GeoTiff(str(rgb_src)).read_bounds(x0, y0, x0 + W, y0 + W)
        arr_nds, t_nds = GeoTiff(str(nds_src)).read_bounds(x0, y0, x0 + W, y0 + W)
        (tmp_path / "rgb").mkdir()
        (tmp_path / "nDSM").mkdir()
        write_geotiff(str(tmp_path / "rgb" / "324125317.tif"),
                      arr_rgb.astype(np.uint8), t_rgb, crs=25832)
        write_geotiff(str(tmp_path / "nDSM" / "324125317.tif"),
                      arr_nds.astype(np.float32)[..., 0], t_nds,
                      crs=25832, nodata=-9999.0)

        cfg_yaml = {
            "image_directory": "rgb", "height_data_path": "nDSM",
            "combined_model": str(ckpt),
            "output_directory": "out", "tiles_path": "tiles",
            "tile_width": 12, "tile_height": 12, "buffer": 5,
            "batch_size": 4, "use_overlap": False,
            "model_depth": 50, "model_input_size": 256,
            "max_detections": 100, "mixed_precision": False,
            "pixel_std": [57.375, 57.12, 58.395],
            "confidence_threshold": 0.4, "containment_threshold": 0.75,
            "height_threshold": 3, "ndvi_mean_threshold": 0.0,
            "ndvi_var_threshold": 0.1,
            "iou_threshold": 0.5, "confidence_threshold_stitching": 0.3,
            "area_threshold": 1, "keep_intermediate": True, "parallel": False,
        }
        cfg_path = tmp_path / "config.yml"
        cfg_path.write_text(yaml.safe_dump(cfg_yaml))

        from treedetection_tpu.config import get_config, Config
        from treedetection_tpu.detection import process_files
        Config.reset()
        config, _ = get_config(str(cfg_path))
        outputs = process_files(config)

        assert len(outputs) == 1 and os.path.exists(outputs[0])
        geoms, props, srs = read_gpkg(outputs[0])
        assert srs == 25832
        assert len(geoms) > 0, "trained checkpoint produced no crowns"
        for p in props:
            assert p["Confidence_score"] >= 0.4
            assert p["TreeHeight"] > 3.0       # height gate applied
            assert p["Area"] >= 1.0            # area gate applied
