"""Weight-conversion tests with torch as the numerical oracle.

These pin the layout conventions (conv OIHW->HWIO, deconv flip, fc1 CHW->HWC
permutation, frozen-BN folding) so converting a real detectron2 checkpoint is
bit-exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

import torch

from treedetection_tpu.models.convert import (
    conv_kernel, convert_detectron2_state_dict, deconv_kernel,
    fc1_weight_chw_to_hwc, fold_frozen_bn, linear_weight)


class TestLayoutParity:
    def test_conv_parity(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)  # OIHW
        x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)  # NCHW
        ref = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                                         padding=1).numpy()
        mod = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
        out = mod.apply({"params": {"kernel": jnp.asarray(conv_kernel(w))}},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        assert np.allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4)

    def test_strided_conv_parity(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((4, 3, 7, 7)).astype(np.float32)
        x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        ref = torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                                         stride=2, padding=3).numpy()
        mod = nn.Conv(4, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                      use_bias=False)
        out = mod.apply({"params": {"kernel": jnp.asarray(conv_kernel(w))}},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        assert np.allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4)

    def test_deconv_parity(self):
        rng = np.random.default_rng(2)
        w = rng.standard_normal((6, 4, 2, 2)).astype(np.float32)  # (in, out, kh, kw)
        x = rng.standard_normal((1, 6, 14, 14)).astype(np.float32)
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
        mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
        out = mod.apply({"params": {"kernel": jnp.asarray(deconv_kernel(w).copy()),
                                    "bias": jnp.zeros(4)}},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        assert np.allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-4)

    def test_linear_parity(self):
        rng = np.random.default_rng(3)
        w = rng.standard_normal((5, 12)).astype(np.float32)
        x = rng.standard_normal((2, 12)).astype(np.float32)
        ref = torch.nn.functional.linear(torch.from_numpy(x), torch.from_numpy(w)).numpy()
        out = jnp.asarray(x) @ jnp.asarray(linear_weight(w))
        assert np.allclose(np.asarray(out), ref, atol=1e-5)

    def test_fc1_chw_permutation(self):
        rng = np.random.default_rng(4)
        C, R = 3, 4
        w = rng.standard_normal((7, C * R * R)).astype(np.float32)
        feat_chw = rng.standard_normal((C, R, R)).astype(np.float32)
        ref = w @ feat_chw.reshape(-1)
        feat_hwc = np.transpose(feat_chw, (1, 2, 0))
        out = feat_hwc.reshape(-1) @ fc1_weight_chw_to_hwc(w, C, R)
        assert np.allclose(out, ref, atol=1e-5)

    def test_bn_fold(self):
        rng = np.random.default_rng(5)
        g, b = rng.standard_normal(8).astype(np.float32), rng.standard_normal(8).astype(np.float32)
        m, v = rng.standard_normal(8).astype(np.float32), rng.random(8).astype(np.float32) + 0.1
        x = rng.standard_normal((4, 8)).astype(np.float32)
        ref = (x - m) / np.sqrt(v + 1e-5) * g + b
        scale, bias = fold_frozen_bn(g, b, m, v)
        assert np.allclose(x * scale + bias, ref, atol=1e-5)


def _make_fake_d2_state_dict(depth=50, num_classes=1):
    """Random detectron2-style state dict with correct names/shapes."""
    rng = np.random.default_rng(0)
    sd = {}

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    def add_convbn(name, cin, cout, k):
        sd[f"{name}.weight"] = t(cout, cin, k, k)
        sd[f"{name}.norm.weight"] = t(cout)
        sd[f"{name}.norm.bias"] = t(cout)
        sd[f"{name}.norm.running_mean"] = t(cout)
        sd[f"{name}.norm.running_var"] = torch.from_numpy(
            rng.random(cout).astype(np.float32) + 0.5)

    add_convbn("backbone.bottom_up.stem.conv1", 3, 64, 7)
    from treedetection_tpu.models.resnet import STAGE_BLOCKS
    cin, width, cout = 64, 64, 256
    for s, n in enumerate(STAGE_BLOCKS[depth]):
        for i in range(n):
            p = f"backbone.bottom_up.res{s + 2}.{i}"
            block_in = cin if i == 0 else cout
            add_convbn(f"{p}.conv1", block_in, width, 1)
            add_convbn(f"{p}.conv2", width, width, 3)
            add_convbn(f"{p}.conv3", width, cout, 1)
            if i == 0:
                add_convbn(f"{p}.shortcut", block_in, cout, 1)
        cin, width, cout = cout, width * 2, cout * 2
    for lvl, c in zip(range(2, 6), (256, 512, 1024, 2048)):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = t(256, c, 1, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = t(256)
        sd[f"backbone.fpn_output{lvl}.weight"] = t(256, 256, 3, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = t(256)
    sd["proposal_generator.rpn_head.conv.weight"] = t(256, 256, 3, 3)
    sd["proposal_generator.rpn_head.conv.bias"] = t(256)
    sd["proposal_generator.rpn_head.objectness_logits.weight"] = t(3, 256, 1, 1)
    sd["proposal_generator.rpn_head.objectness_logits.bias"] = t(3)
    sd["proposal_generator.rpn_head.anchor_deltas.weight"] = t(12, 256, 1, 1)
    sd["proposal_generator.rpn_head.anchor_deltas.bias"] = t(12)
    sd["roi_heads.box_head.fc1.weight"] = t(1024, 256 * 49)
    sd["roi_heads.box_head.fc1.bias"] = t(1024)
    sd["roi_heads.box_head.fc2.weight"] = t(1024, 1024)
    sd["roi_heads.box_head.fc2.bias"] = t(1024)
    sd["roi_heads.box_predictor.cls_score.weight"] = t(num_classes + 1, 1024)
    sd["roi_heads.box_predictor.cls_score.bias"] = t(num_classes + 1)
    sd["roi_heads.box_predictor.bbox_pred.weight"] = t(num_classes * 4, 1024)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = t(num_classes * 4)
    for i in range(1, 5):
        sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = t(256, 256, 3, 3)
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = t(256)
    sd["roi_heads.mask_head.deconv.weight"] = t(256, 256, 2, 2)
    sd["roi_heads.mask_head.deconv.bias"] = t(256)
    sd["roi_heads.mask_head.predictor.weight"] = t(num_classes, 256, 1, 1)
    sd["roi_heads.mask_head.predictor.bias"] = t(num_classes)
    return sd


class TestFullConversion:
    def test_converted_tree_matches_model_structure(self):
        from treedetection_tpu.models import MaskRCNN, MaskRCNNConfig
        from treedetection_tpu.models.mask_rcnn import create_model
        sd = _make_fake_d2_state_dict(depth=50)
        converted = convert_detectron2_state_dict(sd, depth=50)
        cfg = MaskRCNNConfig(depth=50, input_size=128, rpn_pre_nms_topk=50,
                             rpn_post_nms_topk=20, max_detections=5, bf16=False)
        model, params = create_model(cfg)
        ref_shapes = jax.tree.map(lambda a: a.shape, params)
        got_shapes = jax.tree.map(lambda a: a.shape, converted)
        assert ref_shapes == got_shapes
        # and the converted params actually run
        out = model.apply(converted, jnp.zeros((1, 128, 128, 3)))
        assert np.isfinite(np.asarray(out.scores)).all()

    def test_pth_roundtrip(self, tmp_path):
        from treedetection_tpu.models.convert import load_checkpoint
        sd = _make_fake_d2_state_dict(depth=50)
        p = str(tmp_path / "model.pth")
        torch.save({"model": sd}, p)
        params = load_checkpoint(p, depth=50)
        assert "params" in params
        assert params["params"]["rpn_head"]["conv"]["kernel"].shape == (3, 3, 256, 256)

    def test_scan_layout_matches_unrolled_bit_exact(self):
        """The scanned backbone (stacked res{s}_rest params via lax.scan)
        produces bit-identical outputs to the unrolled layout — the same conv
        sequence runs per iteration (resnet.ResNet.scan_blocks docstring)."""
        import dataclasses
        from treedetection_tpu.models import MaskRCNN, MaskRCNNConfig
        from treedetection_tpu.models.convert import restack_backbone
        from treedetection_tpu.models.mask_rcnn import create_model
        cfg = MaskRCNNConfig(depth=50, input_size=128, rpn_pre_nms_topk=50,
                             rpn_post_nms_topk=20, max_detections=5,
                             bf16=False)
        model, params = create_model(cfg)  # scan layout (default)
        unrolled = MaskRCNN(dataclasses.replace(cfg, scan_blocks=False))
        p_un = restack_backbone(jax.tree.map(np.asarray, params), scan=False)
        bu = p_un["params"]["backbone"]["bottom_up"]
        assert "res3_1" in bu and "res3_rest" not in bu
        x = jnp.asarray(np.random.default_rng(5).normal(
            size=(1, 128, 128, 3)).astype(np.float32))
        a = model.apply(params, x)
        b = unrolled.apply(p_un, x)
        np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
        np.testing.assert_array_equal(np.asarray(a.masks), np.asarray(b.masks))
        # legacy tree restacks back to the scan layout and still runs exactly
        p_re = restack_backbone(p_un, scan=True)
        bu2 = p_re["params"]["backbone"]["bottom_up"]
        assert "res3_rest" in bu2 and "res3_1" not in bu2
        c = model.apply(p_re, x)
        np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(c.boxes))


class TestBF16ParamStorage:
    """bf16 serving stores the device param copy in bf16 (prediction.Predictor):
    every module reads params through ``astype(cfg.dtype)``, so bf16 storage
    must be bit-identical to fp32 storage under bf16 compute."""

    def test_bf16_stored_params_bit_identical_under_bf16_compute(self):
        import ml_dtypes
        from treedetection_tpu.models import MaskRCNN, MaskRCNNConfig
        from treedetection_tpu.models.mask_rcnn import create_model
        cfg = MaskRCNNConfig(depth=50, input_size=128, rpn_pre_nms_topk=50,
                             rpn_post_nms_topk=20, max_detections=5,
                             bf16=True)
        model, params = create_model(cfg)
        p16 = jax.tree.map(
            lambda a: np.asarray(a).astype(ml_dtypes.bfloat16)
            if np.asarray(a).dtype.kind == "f" else np.asarray(a), params)
        x = jnp.asarray(np.random.default_rng(7).normal(
            size=(1, 128, 128, 3)).astype(np.float32))
        a = model.apply(params, x)
        b = model.apply(p16, x)
        np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
        np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))
        np.testing.assert_array_equal(np.asarray(a.masks), np.asarray(b.masks))

    def test_npz_param_dtype_none_keeps_stored_halfwidth(self, tmp_path):
        from treedetection_tpu.models.convert import (load_checkpoint,
                                                      save_checkpoint_npz)
        tree = {"params": {"w": np.arange(8, dtype=np.float32) / 7.0,
                           "big": np.asarray([1e5], dtype=np.float32)}}
        p = str(tmp_path / "m.npz")
        save_checkpoint_npz(p, tree)
        kept = load_checkpoint(p, param_dtype=None)["params"]
        assert kept["w"].dtype == np.float16
        # the fp16-overflow leaf stays fp32 in storage and on load
        assert kept["big"].dtype == np.float32
        wide = load_checkpoint(p)["params"]
        assert wide["w"].dtype == np.float32
        np.testing.assert_array_equal(wide["w"],
                                      kept["w"].astype(np.float32))
