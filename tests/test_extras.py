"""Tests for pallas kernels (interpret mode), training data pipeline,
box autolabeling, hyperparam sweep, and profiling utils."""

import os

import numpy as np
import pytest

import jax.numpy as jnp


def square(x0, y0, size):
    return np.array([[x0, y0], [x0 + size, y0], [x0 + size, y0 + size], [x0, y0 + size]],
                    dtype=np.float64)


class TestPallasIoU:
    def _boxes(self, n=300, seed=0):
        rng = np.random.default_rng(seed)
        c = rng.uniform(0, 500, (n, 2))
        s = rng.uniform(5, 50, (n, 2))
        return jnp.asarray(np.concatenate([c - s / 2, c + s / 2], axis=1),
                           dtype=jnp.float32)

    def test_iou_mask_matches_jnp(self):
        from treedetection_tpu.ops.pallas import pairwise_iou_mask
        from treedetection_tpu.ops.boxes import box_iou_matrix
        boxes = self._boxes()
        got = np.asarray(pairwise_iou_mask(boxes, 0.5, force_interpret=True))
        want = np.asarray(box_iou_matrix(boxes, boxes) > 0.5).astype(np.uint8)
        assert np.array_equal(got, want)

    def test_containment_mask_matches_jnp(self):
        from treedetection_tpu.ops.pallas import pairwise_containment_mask
        from treedetection_tpu.ops.boxes import pairwise_intersection_over_area
        boxes = self._boxes(n=200, seed=1)
        got = np.asarray(pairwise_containment_mask(boxes, 0.9,
                                                   force_interpret=True))
        ratios = np.asarray(pairwise_intersection_over_area(boxes, boxes)).T
        want = (ratios >= 0.9).astype(np.uint8)
        np.fill_diagonal(want, 0)
        assert np.array_equal(got, want)

    def test_non_multiple_of_tile(self):
        from treedetection_tpu.ops.pallas import pairwise_iou_mask
        boxes = self._boxes(n=7)
        out = np.asarray(pairwise_iou_mask(boxes, 0.5, force_interpret=True))
        assert out.shape == (7, 7)
        assert (np.diag(out) == 1).all()  # IoU(self) = 1 > 0.5


class TestTrainingData:
    def test_make_tiles_and_shards(self, tmp_path, rng):
        from treedetection_tpu.geo import Affine, write_geotiff
        from treedetection_tpu.vector import write_gpkg
        from treedetection_tpu.train.data import (
            ShardDataset, make_training_tiles, train_test_split, write_shards)
        t = Affine.from_origin(0.0, 100.0, 0.5, 0.5)
        img = rng.integers(0, 255, (200, 200, 4), dtype=np.uint8)
        tif = str(tmp_path / "img.tif")
        write_geotiff(tif, img, t, crs=25832)
        crowns = [square(10, 10, 8), square(30, 60, 10), square(60, 30, 6)]
        gpkg = str(tmp_path / "crowns.gpkg")
        write_gpkg(gpkg, crowns, [{"Confidence_score": 1.0}] * 3)

        examples = list(make_training_tiles(tif, gpkg, tile_size_m=50,
                                            buffer_m=10, input_size=128,
                                            max_gt=8))
        assert len(examples) >= 1
        ex = examples[0]
        assert ex["image"].shape == (128, 128, 3)
        assert ex["boxes"].shape == (8, 4)
        assert ex["masks"].shape == (8, 32, 32)
        assert ex["valid"].any()
        # a valid box must be inside the input frame and non-degenerate
        vb = ex["boxes"][ex["valid"]]
        assert (vb[:, 2] > vb[:, 0]).all() and (vb[:, 3] > vb[:, 1]).all()
        assert (vb >= 0).all() and (vb <= 128).all()
        # the mask of a valid crown has pixels set
        assert ex["masks"][np.where(ex["valid"])[0][0]].sum() > 0

        shards = write_shards(iter(examples), str(tmp_path / "shards"),
                              shard_size=2)
        assert shards
        folds = train_test_split(shards, test_frac=0.5)
        train, test = folds[0]
        assert len(train) + len(test) == len(shards)

        ds = ShardDataset(shards, batch_size=3, shuffle=True)
        batch = next(iter(ds))
        assert batch["image"].shape == (3, 128, 128, 3)

    def test_pretraining_tiler(self, tmp_path, rng):
        from treedetection_tpu.geo import Affine, write_geotiff, GeoTiff
        from treedetection_tpu.train.data import prepare_pretraining_tiles
        t = Affine.from_origin(0.0, 100.0, 1.0, 1.0)
        rgb = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
        mask = (rng.random((100, 100)) > 0.5).astype(np.uint8)
        rp = str(tmp_path / "rgb.tif")
        mp = str(tmp_path / "mask.tif")
        write_geotiff(rp, rgb, t, crs=25832)
        write_geotiff(mp, mask, t, crs=25832)
        train, test = prepare_pretraining_tiles(rp, mp, str(tmp_path / "out"),
                                                tile_size_m=50, buffer_m=10,
                                                test_frac=0.5, seed=0)
        assert len(train) + len(test) == 4
        g = GeoTiff(train[0] if train else test[0])
        assert g.width == 70  # 50 + 2*10 buffer at 1 m GSD


class TestBoxAutolabel:
    def test_clean_crowns_best_iou(self):
        from treedetection_tpu.autolabel.boxes import clean_crowns
        crowns = [square(0, 0, 10), square(50, 50, 10)]
        boxes = [(0, 0, 10, 10), (48, 48, 62, 62), (200, 200, 210, 210)]
        out, flags = clean_crowns(crowns, boxes, box_threshold=0.5)
        assert flags == ["crown", "crown", "box"]
        assert np.allclose(out[0][:4], square(0, 0, 10))

    def test_clip_fallback(self):
        from treedetection_tpu.autolabel.boxes import clean_crowns
        from treedetection_tpu.vector import polygon_area
        crowns = [square(0, 0, 20)]  # much bigger than the box
        boxes = [(0, 0, 10, 10)]
        out, flags = clean_crowns(crowns, boxes, box_threshold=0.5)
        assert flags == ["clipped"]
        assert polygon_area(out[0]) == pytest.approx(100.0)

    def test_autolabel_image_flow(self):
        from treedetection_tpu.autolabel.boxes import autolabel_image
        from treedetection_tpu.geo import Affine

        def fake_sam(image, boxes):
            masks = np.zeros((len(boxes), *image.shape[:2]), dtype=bool)
            for i, (x0, y0, x1, y1) in enumerate(boxes.astype(int)):
                masks[i, y0:y1, x0:x1] = True
            return masks

        img = np.zeros((64, 64, 3), dtype=np.uint8)
        t = Affine.from_origin(1000.0, 1064.0, 1.0, 1.0)
        crowns, flags = autolabel_image(img, [(10, 10, 30, 30)], fake_sam,
                                        transform=t)
        assert flags == ["crown"]
        assert crowns[0][:, 0].min() >= 1009  # geo coords

    def test_hyperparam_sweep(self, tmp_path):
        from treedetection_tpu.eval.hyperparams import sweep_postprocessing
        from treedetection_tpu.vector import write_gpkg
        stitched = str(tmp_path / "stitched.gpkg")
        annotations = str(tmp_path / "gt.gpkg")
        crowns = [square(0, 0, 8), square(20, 20, 8), square(50, 50, 8)]
        write_gpkg(stitched, crowns,
                   [{"Confidence_score": s} for s in (0.9, 0.45, 0.35)])
        write_gpkg(annotations, crowns[:2],
                   [{"Area": 64.0, "TreeHeight": 10, "MeanNDVI": 0.5}] * 2)
        base = {"height_threshold": 0, "ndvi_mean_threshold": -2,
                "ndvi_var_threshold": 99, "use_overlap": False,
                "tile_width": 50, "tile_height": 50, "buffer": 20,
                "overlapping_tiles_width": 3, "overlapping_tiles_height": 3,
                "area_threshold": 1, "height_scaling_factor": 1.0,
                "ndvi_scaling_factor": 1.0, "logger": None}
        results = sweep_postprocessing(
            stitched, annotations, base,
            grid={"confidence_threshold": (0.3, 0.5)})
        assert len(results) == 2
        best = results[0]
        # conf 0.3 keeps the 0.35/0.45 crowns -> one extra FP but also the TP;
        # either threshold yields recall on both GT crowns
        assert best["f1"] > 0.5


class TestUtils:
    def test_stage_timer(self):
        from treedetection_tpu.utils import StageTimer
        t = StageTimer()
        with t.span("a"):
            pass
        with t.span("b"):
            pass
        assert set(t.spans) == {"a", "b"}
        assert "Stage timing" in t.summary()

    def test_log_progress_throttles(self):
        from treedetection_tpu.utils import log_progress

        class Fake:
            def __init__(self):
                self.lines = []

            def info(self, msg):
                self.lines.append(msg)

        lg = Fake()
        for i in range(1, 101):
            log_progress(lg, i, 100, "x", every_pct=10)
        assert len(lg.lines) == 10
