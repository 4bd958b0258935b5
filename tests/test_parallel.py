"""Parallel/sharding + checkpoint tests on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from treedetection_tpu.models.mask_rcnn import MaskRCNNConfig, create_model
from treedetection_tpu.parallel import make_mesh, partition_files, replicate, shard_batch


TINY = MaskRCNNConfig(depth=50, input_size=128, rpn_pre_nms_topk=64,
                      rpn_post_nms_topk=32, max_detections=8, bf16=False)


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_make_mesh_from_config(self):
        mesh = make_mesh({"mesh_shape": {"data": 4}})
        assert mesh.devices.size == 4

    def test_shard_batch_places_data(self):
        mesh = make_mesh()
        x = np.zeros((8, 4, 4, 3), dtype=np.float32)
        sharded = shard_batch(jnp.asarray(x), mesh)
        assert len(sharded.sharding.device_set) == 8

    def test_sharded_inference_matches_single(self):
        from treedetection_tpu.parallel.mesh import sharded_forward
        model, params = create_model(TINY)
        mesh = make_mesh()
        fwd = sharded_forward(model, mesh)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((8, 128, 128, 3)),
                        dtype=jnp.float32)
        params_r = replicate(params, mesh)
        out_sharded = fwd(params_r, shard_batch(x, mesh))
        out_single = model.apply(params, x)
        np.testing.assert_allclose(np.asarray(out_sharded.scores),
                                   np.asarray(out_single.scores),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_sharded.boxes),
                                   np.asarray(out_single.boxes),
                                   rtol=1e-4, atol=1e-3)


class TestFilePartition:
    def test_from_env(self, monkeypatch):
        monkeypatch.setenv("TREEDETECTION_NUM_HOSTS", "4")
        monkeypatch.setenv("TREEDETECTION_HOST_ID", "2")
        files = [f"{i}.tif" for i in range(10)]
        mine = partition_files(files)
        assert all(sorted(files).index(f) % 4 == 2 for f in mine)


class TestCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        from treedetection_tpu.train.train import save_checkpoint
        from treedetection_tpu.models.convert import load_checkpoint
        model, params = create_model(TINY)
        ckpt_dir = str(tmp_path / "ckpt")
        save_checkpoint(ckpt_dir, params)
        restored = load_checkpoint(ckpt_dir)
        orig = jax.tree.leaves(params)
        back = jax.tree.leaves(restored)
        assert len(orig) == len(back)
        for a, b in zip(orig, back):
            assert np.allclose(np.asarray(a), np.asarray(b))
