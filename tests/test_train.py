"""Training subsystem tests: losses, target assignment, presets, freeze mask,
and a 2-step optimization on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from treedetection_tpu.models.mask_rcnn import MaskRCNNConfig, MaskRCNN, create_model
from treedetection_tpu.train import PRESETS, TrainConfig, make_train_step
from treedetection_tpu.train.losses import (
    GroundTruth, assign_anchors, mask_rcnn_losses, smooth_l1)
from treedetection_tpu.train.train import make_optimizer, make_sharded_train_step


TINY = MaskRCNNConfig(depth=50, input_size=128, rpn_pre_nms_topk=64,
                      rpn_post_nms_topk=32, max_detections=8, bf16=False)


def make_batch(b=2, g=4, s=128, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.standard_normal((b, s, s, 3)).astype(np.float32),
        "boxes": np.tile(np.array([[10., 10., 60., 60.], [40., 40., 90., 90.],
                                   [0., 0., 30., 30.], [50., 20., 100., 70.]],
                                  dtype=np.float32)[:g], (b, 1, 1)),
        "masks": (rng.random((b, g, s // 4, s // 4)) > 0.5).astype(np.float32),
        "valid": np.ones((b, g), dtype=bool),
    }


class TestAssignment:
    def test_anchor_labels(self):
        anchors = jnp.array([[10, 10, 60, 60],     # exact GT match -> pos
                             [200, 200, 260, 260],  # far -> neg
                             [15, 15, 64, 64]],     # high IoU -> pos
                            dtype=jnp.float32)
        gt = GroundTruth(
            boxes=jnp.array([[10, 10, 60, 60]], dtype=jnp.float32),
            masks=jnp.zeros((1, 8, 8)),
            valid=jnp.array([True]))
        labels, matched = assign_anchors(anchors, gt)
        assert np.asarray(labels).tolist() == [1, 0, 1]
        assert np.asarray(matched).tolist() == [0, 0, 0]

    def test_invalid_gt_ignored(self):
        anchors = jnp.array([[10, 10, 60, 60]], dtype=jnp.float32)
        gt = GroundTruth(
            boxes=jnp.array([[10, 10, 60, 60]], dtype=jnp.float32),
            masks=jnp.zeros((1, 8, 8)),
            valid=jnp.array([False]))
        labels, _ = assign_anchors(anchors, gt)
        assert int(labels[0]) == 0  # nothing to match -> negative

    def test_smooth_l1(self):
        x = jnp.array([-2.0, 0.05, 2.0])
        out = np.asarray(smooth_l1(x, beta=1.0))
        assert out[0] == pytest.approx(1.5)
        assert out[1] == pytest.approx(0.5 * 0.05 ** 2, rel=1e-4)


class TestLosses:
    @pytest.fixture(scope="class")
    def model_params(self):
        return create_model(TINY)

    def test_losses_finite(self, model_params):
        model, params = model_params
        b = make_batch()
        total, parts = mask_rcnn_losses(
            model, params, jnp.asarray(b["image"]), jnp.asarray(b["boxes"]),
            jnp.asarray(b["masks"]), jnp.asarray(b["valid"]),
            jax.random.PRNGKey(0))
        assert np.isfinite(float(total))
        assert set(parts) == {"rpn_objectness", "rpn_regression",
                              "cls", "box_reg", "mask"}
        assert all(np.isfinite(float(v)) for v in parts.values())

    @pytest.mark.slow
    def test_loss_decreases_on_steps(self, model_params):
        model, params = model_params
        tc = TrainConfig.from_preset("update")
        opt = make_optimizer(tc, params)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(model, opt))
        b = jax.tree.map(jnp.asarray, make_batch())
        rng = jax.random.PRNGKey(0)
        losses = []
        for i in range(3):
            params, opt_state, metrics = step(params, opt_state, b, rng)
            losses.append(float(metrics["total_loss"]))
        assert losses[-1] < losses[0]  # same batch -> loss must drop

    def test_backbone_freeze(self, model_params):
        model, params = model_params
        tc = TrainConfig.from_preset("update")
        opt = make_optimizer(tc, params)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(model, opt))
        b = jax.tree.map(jnp.asarray, make_batch())
        stem_before = np.asarray(
            params["params"]["backbone"]["bottom_up"]["stem"]["conv"]["kernel"])
        head_before = np.asarray(
            params["params"]["box_head"]["fc1"]["kernel"])
        new_params, _, _ = step(params, opt_state, b, jax.random.PRNGKey(0))
        stem_after = np.asarray(
            new_params["params"]["backbone"]["bottom_up"]["stem"]["conv"]["kernel"])
        head_after = np.asarray(
            new_params["params"]["box_head"]["fc1"]["kernel"])
        assert np.array_equal(stem_before, stem_after)      # frozen
        assert not np.array_equal(head_before, head_after)  # trained

    @pytest.mark.slow
    def test_sharded_step_on_mesh(self, model_params):
        from jax.sharding import Mesh
        model, params = model_params
        devices = jax.devices()
        assert len(devices) == 8
        mesh = Mesh(np.array(devices), ("data",))
        tc = TrainConfig.from_preset("scratch")
        opt = make_optimizer(tc, params)
        opt_state = opt.init(params)
        step = make_sharded_train_step(model, opt, mesh)
        from treedetection_tpu.parallel import replicate, shard_batch
        b = shard_batch(jax.tree.map(jnp.asarray, make_batch(b=8)), mesh)
        params_r = replicate(params, mesh)
        opt_r = replicate(opt_state, mesh)
        _, _, metrics = step(params_r, opt_r, b, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total_loss"]))


class TestPresets:
    def test_reference_preset_values(self):
        # reference train_foundation_model.py:179-191
        assert PRESETS["update"]["ims_per_batch"] == 9
        assert PRESETS["update"]["base_lr"] == 0.005
        assert PRESETS["scratch"]["ims_per_batch"] == 4
        assert PRESETS["scratch"]["base_lr"] == 0.01
        assert PRESETS["update"]["max_iter"] == 2000
        assert PRESETS["update"]["patience"] == 10

    def test_partition_files(self):
        from treedetection_tpu.parallel import partition_files
        files = [f"f{i}.tif" for i in range(10)]
        a = partition_files(files, host_id=0, num_hosts=3)
        b = partition_files(files, host_id=1, num_hosts=3)
        c = partition_files(files, host_id=2, num_hosts=3)
        assert sorted(a + b + c) == sorted(files)
        assert not (set(a) & set(b))


class TestTrainingIntegration:
    @pytest.mark.slow
    def test_full_training_loop_with_data_pipeline(self, tmp_path):
        """tiles -> shards -> train_model for a few iterations with eval."""
        from treedetection_tpu.geo import Affine, write_geotiff
        from treedetection_tpu.vector import write_gpkg
        from treedetection_tpu.train.data import (
            ShardDataset, make_training_tiles, write_shards)
        from treedetection_tpu.train.train import TrainConfig, train_model

        rng = np.random.default_rng(0)
        t = Affine.from_origin(0.0, 100.0, 0.5, 0.5)
        img = rng.integers(0, 255, (200, 200, 4), dtype=np.uint8)
        tif = str(tmp_path / "img.tif")
        write_geotiff(tif, img, t, crs=25832)
        sq = lambda x0, y0, s: np.array(
            [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float)
        write_gpkg(str(tmp_path / "crowns.gpkg"),
                   [sq(10, 10, 8), sq(30, 60, 10), sq(60, 30, 6)],
                   [{"Confidence_score": 1.0}] * 3)

        examples = list(make_training_tiles(tif, str(tmp_path / "crowns.gpkg"),
                                            tile_size_m=50, buffer_m=10,
                                            input_size=128, max_gt=4))
        shards = write_shards(iter(examples), str(tmp_path / "shards"),
                              shard_size=4)
        ds = ShardDataset(shards, batch_size=2)
        tc = TrainConfig.from_preset("update", max_iter=3)
        params, history = train_model(
            ds, val_dataset=None, model_cfg=TINY, train_cfg=tc)
        assert len(history["total_loss"]) == 3
        assert all(np.isfinite(v) for v in history["total_loss"])

    @pytest.mark.slow
    def test_remat_backbone_trains(self):
        """remat=True must produce identical losses (checkpointing is
        numerics-neutral) while saving activation memory."""
        import dataclasses
        from treedetection_tpu.train import make_train_step
        from treedetection_tpu.train.train import make_optimizer
        cfg_r = dataclasses.replace(TINY, remat=True)
        model_r, params = create_model(cfg_r)
        model_n = MaskRCNN(TINY)
        b = jax.tree.map(jnp.asarray, make_batch(b=1, s=128))
        from treedetection_tpu.train.losses import mask_rcnn_losses
        rngk = jax.random.PRNGKey(0)
        t_r, _ = mask_rcnn_losses(model_r, params, b["image"], b["boxes"],
                                  b["masks"], b["valid"], rngk)
        t_n, _ = mask_rcnn_losses(model_n, params, b["image"], b["boxes"],
                                  b["masks"], b["valid"], rngk)
        assert np.allclose(float(t_r), float(t_n), rtol=1e-5)


class TestNdviDebug:
    def test_writes_tif_and_png(self, tmp_path, rng):
        from treedetection_tpu.geo import Affine, write_geotiff, GeoTiff
        from treedetection_tpu.utils.ndvi_debug import write_ndvi_debug
        rgbi = rng.integers(0, 255, (50, 50, 4), dtype=np.uint8)
        t = Affine.from_origin(0.0, 50.0, 1.0, 1.0)
        src = str(tmp_path / "img.tif")
        write_geotiff(src, rgbi, t, crs=25832)
        tif, png = write_ndvi_debug(src, str(tmp_path / "dbg"))
        g = GeoTiff(tif)
        vals = g.read()[:, :, 0]
        assert ((-1 <= vals) & (vals <= 1)).all()
        import os
        assert os.path.exists(png)
