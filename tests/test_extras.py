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

    def test_dedupe_mask_matches_dense(self):
        from treedetection_tpu.ops.pallas import pairwise_dedupe_mask
        from treedetection_tpu.ops.boxes import box_iou_matrix
        boxes = self._boxes(n=150, seed=2)
        rng = np.random.default_rng(3)
        areas = jnp.asarray(rng.uniform(1, 100, 150).astype(np.float32))
        got = np.asarray(pairwise_dedupe_mask(boxes, areas, 0.5, 0.3,
                                              force_interpret=True))
        iou = np.asarray(box_iou_matrix(boxes, boxes))
        a = np.asarray(areas)
        rel = np.abs(a[:, None] - a[None, :]) / np.maximum(a[:, None], a[None, :])
        want = ((iou > 0.5) & (rel < 0.3)).astype(np.uint8)
        assert np.array_equal(got, want)

    def test_rectangular_rows(self):
        from treedetection_tpu.ops.pallas import (
            pairwise_containment_mask, pairwise_iou_mask)
        boxes = self._boxes(n=90, seed=4)
        full_iou = np.asarray(pairwise_iou_mask(boxes, 0.5,
                                                force_interpret=True))
        block = np.asarray(pairwise_iou_mask(boxes, 0.5, rows=boxes[30:60],
                                             force_interpret=True))
        assert np.array_equal(block, full_iou[30:60])
        full_c = np.asarray(pairwise_containment_mask(boxes, 0.8,
                                                      force_interpret=True))
        blk_c = np.array(pairwise_containment_mask(boxes, 0.8,
                                                   rows=boxes[30:60],
                                                   force_interpret=True))
        # rectangular blocks don't clear the diagonal; do it before comparing
        for k in range(30):
            blk_c[k, 30 + k] = 0
        assert np.array_equal(blk_c, full_c[30:60])


class TestSparsePostprocessing:
    """The blocked sparse dedupe/containment path must reproduce the dense
    reference loops exactly."""

    def _crowd(self, n, seed=0, span=2000.0):
        rng = np.random.default_rng(seed)
        c = rng.uniform(0, span, (n, 2))
        s = rng.uniform(2, 12, (n, 2))
        bounds = np.concatenate([c - s / 2, c + s / 2], axis=1).astype(np.float32)
        areas = (s[:, 0] * s[:, 1] * rng.uniform(0.6, 1.0, n)).astype(np.float32)
        scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
        return bounds, areas, scores

    @staticmethod
    def _dense_greedy(bounds, areas, scores, iou_thr, area_thr=0.3):
        from treedetection_tpu.ops.boxes import box_iou_matrix
        iou = np.asarray(box_iou_matrix(jnp.asarray(bounds), jnp.asarray(bounds)))
        a = areas[:, None]
        rel = np.abs(a - areas[None, :]) / np.maximum(a, areas[None, :])
        mask = (iou > iou_thr) & (rel < area_thr)
        remove = np.zeros(len(bounds), dtype=bool)
        for i in range(len(bounds)):
            if remove[i]:
                continue
            connected = np.append(np.where(mask[i])[0], i)
            best = connected[np.argmax(scores[connected])]
            for j in connected:
                if j != best:
                    remove[j] = True
        return ~remove

    def test_sparse_dedupe_matches_dense_loop(self):
        from treedetection_tpu.postprocessing import filter_by_iou_and_area
        bounds, areas, scores = self._crowd(400, seed=5, span=300.0)
        got = filter_by_iou_and_area(bounds, areas, scores, 0.5)
        want = self._dense_greedy(bounds, areas, scores, 0.5)
        assert np.array_equal(got, want)
        assert got.sum() < len(bounds)  # dense crowd: something deduped

    def test_blocked_streaming_matches_single_block(self):
        from treedetection_tpu.postprocessing import _sparse_relation_pairs
        bounds, areas, _ = self._crowd(500, seed=6, span=400.0)
        i1, j1 = _sparse_relation_pairs("dedupe", bounds, 0.5, areas=areas)
        i2, j2 = _sparse_relation_pairs("dedupe", bounds, 0.5, areas=areas,
                                        block=128)
        assert np.array_equal(i1, i2) and np.array_equal(j1, j2)
        c1 = _sparse_relation_pairs("containment", bounds, 0.8)
        c2 = _sparse_relation_pairs("containment", bounds, 0.8, block=192)
        assert np.array_equal(c1[0], c2[0]) and np.array_equal(c1[1], c2[1])

    def test_containment_rules_sparse_matches_dense_loop(self):
        from treedetection_tpu.postprocessing import (
            apply_containment_rules_sparse)
        rng = np.random.default_rng(7)
        # engineered nests: umbrellas containing 1, 2, 3 crowns + mutual pair
        bounds = [[0, 0, 100, 100], [10, 10, 20, 20], [30, 30, 40, 40],
                  [50, 50, 60, 60],                    # 0 contains 1,2,3
                  [200, 200, 230, 230], [205, 205, 225, 225],  # 4 contains 5
                  [300, 300, 310, 310], [300, 300, 310, 310],  # mutual 6<->7
                  [400, 400, 405, 405]]                         # isolated
        bounds = np.asarray(bounds, dtype=np.float32)
        n = len(bounds)
        from treedetection_tpu.ops.boxes import pairwise_intersection_over_area
        ratios = np.asarray(pairwise_intersection_over_area(
            jnp.asarray(bounds), jnp.asarray(bounds))).T
        contains = ratios >= 0.9
        np.fill_diagonal(contains, False)
        mean_ndvi = rng.uniform(0, 1, n).astype(np.float32)
        var_ndvi = rng.uniform(0, 0.2, n).astype(np.float32)
        areas = rng.uniform(1, 100, n).astype(np.float32)

        # dense oracle (the reference loop, postprocessing.py:636-667)
        keep = np.ones(n, dtype=bool)
        for i in range(n):
            nc = contains[i].sum()
            if nc >= 3:
                keep[i] = False
            elif nc == 2:
                if any(contains[j, i] for j in np.where(contains[i])[0]):
                    keep[i] = False
            elif nc == 1:
                j = int(np.where(contains[i])[0][0])
                if abs(mean_ndvi[i] - mean_ndvi[j]) > 0.05:
                    if var_ndvi[i] >= var_ndvi[j]:
                        keep[i] = False
                elif areas[i] <= areas[j]:
                    keep[i] = False
        pi, pj = np.nonzero(contains)
        got = apply_containment_rules_sparse(pi, pj, mean_ndvi, var_ndvi,
                                             areas, n)
        assert np.array_equal(got, keep)
        assert not keep[0]  # the 3-crown umbrella dropped

    @pytest.mark.slow
    def test_county_scale_dedupe(self):
        """N = 50k crowns: the blocked sparse path completes in bounded
        memory/time (the dense N^2 fp32 path would need 10 GB)."""
        import time
        from treedetection_tpu.postprocessing import filter_by_iou_and_area
        bounds, areas, scores = self._crowd(50_000, seed=8, span=20_000.0)
        t0 = time.time()
        keep = filter_by_iou_and_area(bounds, areas, scores, 0.5)
        dt = time.time() - t0
        assert keep.sum() > 0
        assert dt < 300, f"county-scale dedupe too slow: {dt:.0f}s"


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

    def test_region_grow_generator(self):
        """The first-party mask generator segments a bright blob inside each
        prompt box (autolabel_image is runnable without SAM)."""
        from treedetection_tpu.autolabel import region_grow_mask_generator
        img = np.zeros((64, 64, 3), dtype=np.uint8)
        img[...] = (40, 30, 40)                 # dull background
        img[12:28, 10:26, 1] = 200              # green blob in box 1
        img[40:56, 36:52, 1] = 180              # green blob in box 2
        boxes = np.array([[8, 10, 28, 30], [34, 38, 54, 58]], dtype=np.float64)
        masks = region_grow_mask_generator(img, boxes)
        assert masks.shape == (2, 64, 64)
        assert masks[0][20, 18] and not masks[0][5, 5]
        assert masks[1][48, 44]
        # blobs recovered with decent IoU against their true extent
        true0 = np.zeros((64, 64), bool)
        true0[12:28, 10:26] = True
        inter = (masks[0] & true0).sum()
        union = (masks[0] | true0).sum()
        assert inter / union > 0.7

    def test_cambridge_autolabel_eval(self, tmp_path, rng):
        """Per-image Cambridge flow: boxes from annotations -> autolabel ->
        P/R/F1 vs the same annotations (reference
        segment_evaluation_cambridge.py)."""
        from treedetection_tpu.autolabel import autolabel_and_evaluate
        from treedetection_tpu.geo import Affine, write_geotiff
        from treedetection_tpu.vector import read_gpkg, write_gpkg
        t = Affine.from_origin(500.0, 600.0, 1.0, 1.0)
        img = np.zeros((100, 100, 3), dtype=np.uint8)
        img[...] = (50, 40, 50)
        img[20:40, 20:40, 1] = 210   # crown A at geo (520..540, 560..580)
        img[60:85, 55:80, 1] = 190   # crown B
        tif = str(tmp_path / "img.tif")
        write_geotiff(tif, img, t, crs=25832)
        ann = [square(520, 560, 20), square(555, 515, 25)]
        gp = str(tmp_path / "ann.gpkg")
        write_gpkg(gp, ann, [{}] * 2)
        out = str(tmp_path / "autolabel.gpkg")
        row = autolabel_and_evaluate(tif, gp, out_gpkg=out)
        assert row["n_annotations"] == 2 and row["n_crowns"] == 2
        assert row["f1"] > 0.9 and row["mean_iou"] > 0.5
        geoms, props, srs = read_gpkg(out)
        assert len(geoms) == 2 and srs == 25832
        assert all(p["flag"] in ("crown", "clipped", "box") for p in props)

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


class TestInputSizeGuard:
    """Config-load guard for backend-crashing model input shapes (VERDICT r2
    weak #4): fail fast with an actionable message instead of a TPU-worker
    crash mid-county-run."""

    def test_known_bad_size_rejected_on_tpu(self, monkeypatch):
        from treedetection_tpu.config import _validate_model_input_size
        monkeypatch.delenv("TD_ALLOW_UNSAFE_INPUT_SIZE", raising=False)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="repro_512_crash"):
            _validate_model_input_size(
                {"device": "tpu", "model_input_size": 512})
        # the real chip reports platform "axon", never the literal "tpu" —
        # the guard must fire for ANY accelerator platform
        with _pytest.raises(ValueError, match="repro_512_crash"):
            _validate_model_input_size(
                {"device": "axon", "model_input_size": 512})

    def test_cpu_and_good_sizes_pass(self, monkeypatch):
        from treedetection_tpu.config import _validate_model_input_size
        monkeypatch.delenv("TD_ALLOW_UNSAFE_INPUT_SIZE", raising=False)
        _validate_model_input_size({"device": "cpu", "model_input_size": 512})
        _validate_model_input_size({"device": "tpu", "model_input_size": 1024})

    def test_env_override(self, monkeypatch):
        from treedetection_tpu.config import _validate_model_input_size
        monkeypatch.setenv("TD_ALLOW_UNSAFE_INPUT_SIZE", "1")
        _validate_model_input_size({"device": "tpu", "model_input_size": 512})


class TestCheckpointLoadHostOnly:
    def test_npz_load_returns_numpy_leaves(self, tmp_path):
        """Checkpoint loading must stay on host: a per-leaf jnp.asarray
        compiles one convert_element_type program per shape on the active
        backend (~500 remote mini-compiles = minutes of load time)."""
        import numpy as np
        from treedetection_tpu.models.convert import (
            save_checkpoint_npz, load_checkpoint)
        params = {"a": {"w": np.ones((4, 4), np.float32),
                        "b": np.zeros((7,), np.float32)}}
        path = str(tmp_path / "m.npz")
        save_checkpoint_npz(path, params)
        out = load_checkpoint(path, depth=50)
        leaves = []

        def rec(t):
            if isinstance(t, dict):
                for v in t.values():
                    rec(v)
            else:
                leaves.append(t)

        rec(out)
        assert leaves and all(type(a) is np.ndarray for a in leaves)


class TestGridPairsEquivalence:
    """Host uniform-grid sparse pairs == streamed device-kernel relation
    (the device path stays the oracle behind TD_PAIRS_DEVICE=1)."""

    def _random_bounds(self, rng, n):
        x0 = rng.uniform(0, 900, n)
        y0 = rng.uniform(0, 900, n)
        w = rng.uniform(1, 30, n)
        h = rng.uniform(1, 30, n)
        return np.stack([x0, y0, x0 + w, y0 + h], axis=1)

    def _canon(self, pi, pj):
        return set(zip(pi.tolist(), pj.tolist()))

    def test_dedupe_pairs_match_device(self, rng, monkeypatch):
        from treedetection_tpu import postprocessing as pp
        bounds = self._random_bounds(rng, 300)
        areas = ((bounds[:, 2] - bounds[:, 0])
                 * (bounds[:, 3] - bounds[:, 1]) * 0.8)
        monkeypatch.delenv("TD_PAIRS_DEVICE", raising=False)
        hi, hj = pp._sparse_relation_pairs("dedupe", bounds, 0.3,
                                           areas=areas, area_threshold=0.5)
        monkeypatch.setenv("TD_PAIRS_DEVICE", "1")
        di, dj = pp._sparse_relation_pairs("dedupe", bounds, 0.3,
                                           areas=areas, area_threshold=0.5)
        assert self._canon(hi, hj) == self._canon(di, dj)
        assert len(di) > 0  # non-vacuous

    def test_containment_pairs_match_device(self, rng, monkeypatch):
        from treedetection_tpu import postprocessing as pp
        bounds = self._random_bounds(rng, 200)
        # add boxes fully containing others
        inner = bounds[:40].copy()
        inner[:, 0] += 2; inner[:, 1] += 2
        inner[:, 2] -= 2; inner[:, 3] -= 2
        allb = np.concatenate([bounds, np.maximum(inner, 0)])
        monkeypatch.delenv("TD_PAIRS_DEVICE", raising=False)
        hi, hj = pp._sparse_relation_pairs("containment", allb, 0.9)
        monkeypatch.setenv("TD_PAIRS_DEVICE", "1")
        di, dj = pp._sparse_relation_pairs("containment", allb, 0.9)
        assert self._canon(hi, hj) == self._canon(di, dj)
        assert len(di) > 0


class TestRegionGrowLabels:
    def test_generate_from_ndsm(self, tmp_path):
        """Cross-generator autolabels: region-grow labels from an nDSM with
        two synthetic tree mounds produce georeferenced crowns."""
        from treedetection_tpu.autolabel import generate_region_grow_labels
        from treedetection_tpu.geo import Affine, write_geotiff
        from treedetection_tpu.vector import read_gpkg

        h, w = 64, 64
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        ndsm = np.zeros((h, w), np.float32)
        for cy, cx in ((20, 20), (44, 42)):
            ndsm += 8.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 30.0)
        t = Affine.from_origin(412000.0, 5318000.0, 1.0, 1.0)
        src = tmp_path / "ndsm.tif"
        write_geotiff(str(src), ndsm, t, crs=25832, nodata=-9999.0)

        out = tmp_path / "labels.gpkg"
        n = generate_region_grow_labels(str(src), str(out))
        assert n >= 2
        geoms, props, srs = read_gpkg(str(out))
        assert srs == 25832 and len(geoms) == n
        ring = np.asarray(geoms[0][0][0])
        assert 412000.0 <= ring[:, 0].min() <= 412064.0
        assert props[0]["TreeHeight"] > 3.0


class TestConfigResolution:
    def _write_min_config(self, tmp_path, extra=""):
        (tmp_path / "rgb").mkdir()
        (tmp_path / "nDSM").mkdir()
        model = tmp_path / "m.npz"
        model.write_bytes(b"x")
        cfg = tmp_path / "config.yml"
        cfg.write_text(
            "image_directory: rgb\nheight_data_path: nDSM\n"
            f"combined_model: m.npz\noutput_directory: out\n"
            f"tiles_path: tiles\n{extra}")
        return str(cfg)

    def test_merged_path_stays_a_bare_name(self, tmp_path):
        """merged_path is a subdirectory NAME joined under each image
        directory; path-resolving it would make os.path.join discard the
        image directory and lose every seam strip."""
        from treedetection_tpu.config import get_config, Config
        cfg_path = self._write_min_config(tmp_path, "merged_path: merged\n")
        config, _ = get_config(cfg_path)
        Config.reset()
        assert config["merged_path"] == "merged"
        assert not os.path.isabs(config["merged_path"])

    def test_missing_ndvi_keys_warn(self, tmp_path):
        from treedetection_tpu.config import get_config, Config
        cfg_path = self._write_min_config(tmp_path)
        config, _ = get_config(cfg_path)
        Config.reset()
        log_dir = os.path.join(config["output_directory"], "logs")
        logs = ""
        for f in os.listdir(log_dir):
            with open(os.path.join(log_dir, f)) as fh:
                logs += fh.read()
        assert "ndvi_mean_threshold" in logs and "defaulting" in logs
        assert config["ndvi_mean_threshold"] == 0.1

    def test_device_cpu_selects_cpu_devices(self, tmp_path):
        from treedetection_tpu.config import get_config, Config
        cfg_path = self._write_min_config(tmp_path, "device: cpu\n")
        config, _ = get_config(cfg_path)
        Config.reset()
        assert config["device"] == "cpu"
        assert all(d.platform == "cpu" for d in config["devices"])

    def test_predictor_honors_config_devices(self):
        """The YAML device selection must reach the Predictor (previously
        config['devices'] had no consumer and the key was a silent no-op)."""
        import jax
        from treedetection_tpu.prediction import Predictor
        cpu = jax.devices("cpu")[0]
        p = Predictor({"devices": [cpu], "batch_size": 2,
                       "model_input_size": 64, "logger": None}, None)
        assert p.devices == [cpu]
        leaf = jax.tree.leaves(p.params)[0]
        assert list(leaf.devices())[0].platform == "cpu"
