"""Model tests: Flax Mask R-CNN forward at small scale on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from treedetection_tpu.models import MaskRCNN, MaskRCNNConfig
from treedetection_tpu.models.anchors import (
    base_anchors, grid_anchors, pyramid_anchors, pyramid_anchors_jnp)
from treedetection_tpu.models.mask_rcnn import create_model


SMALL = MaskRCNNConfig(depth=50, input_size=128, rpn_pre_nms_topk=200,
                       rpn_post_nms_topk=100, max_detections=10,
                       score_threshold=0.05, bf16=False)


@pytest.fixture(scope="module")
def small_model():
    model, params = create_model(SMALL)
    return model, params


class TestAnchors:
    def test_base_anchor_areas(self):
        a = base_anchors(64, (0.5, 1.0, 2.0))
        areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        assert np.allclose(areas, 64 * 64, rtol=1e-5)
        ratios = (a[:, 3] - a[:, 1]) / (a[:, 2] - a[:, 0])
        assert np.allclose(sorted(ratios), [0.5, 1.0, 2.0], rtol=1e-5)

    def test_grid_layout(self):
        g = grid_anchors(4, 4, 16, 32, (1.0,))
        assert g.shape == (16, 4)
        centers_x = (g[:, 0] + g[:, 2]) / 2
        assert np.allclose(centers_x[:4], [0, 16, 32, 48])

    def test_pyramid_counts(self):
        levels = pyramid_anchors(128)
        # strides 4..64 -> 32^2, 16^2, 8^2, 4^2, 2^2 cells x 3 anchors
        assert [a.shape[0] for a in levels] == [3072, 768, 192, 48, 12]

    def test_jnp_anchors_bit_identical(self):
        """The on-device iota generator must equal the numpy reference
        exactly (it feeds the RPN decode inside the jitted forward)."""
        import numpy as np
        for a, b in zip(pyramid_anchors(256), pyramid_anchors_jnp(256)):
            assert np.array_equal(a, np.asarray(b))


class TestMaskRCNN:
    def test_forward_shapes(self, small_model):
        model, params = small_model
        x = jnp.zeros((2, 128, 128, 3), dtype=jnp.float32)
        out = model.apply(params, x)
        assert out.boxes.shape == (2, 10, 4)
        assert out.scores.shape == (2, 10)
        assert out.masks.shape == (2, 10, 28, 28)
        assert out.valid.dtype == jnp.bool_

    def test_forward_jits(self, small_model):
        model, params = small_model
        fwd = jax.jit(lambda p, x: model.apply(p, x))
        x = jnp.ones((1, 128, 128, 3), dtype=jnp.float32)
        out = fwd(params, x)
        assert np.isfinite(np.asarray(out.boxes)).all()
        # scores for invalid detections are zeroed
        s = np.asarray(out.scores)
        v = np.asarray(out.valid)
        assert (s[~v] == 0).all()

    def test_boxes_within_image(self, small_model):
        model, params = small_model
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), dtype=jnp.float32)
        out = model.apply(params, x)
        b = np.asarray(out.boxes)
        assert (b >= 0).all() and (b <= 128).all()


class TestFoldW:
    """W-folded res2 (resnet.fold_kernel_w): identical math on the identical
    param tree, ~2x res2 MXU throughput at production geometry."""

    def test_fold_kernel_w_conv_equivalence(self):
        # folded conv on W-paired channels == original stride-1 SAME conv
        from treedetection_tpu.models.resnet import fold_kernel_w
        rng = np.random.default_rng(3)
        # kw 5 and 9 (even half) regression: a closed-form fmin once
        # over-extended the folded range there, shifting SAME padding a tap
        for k, cin, cout in ((3, 4, 8), (1, 4, 8), (3, 8, 4), (5, 4, 8),
                             (7, 4, 8), (9, 4, 4)):
            x = jnp.asarray(rng.standard_normal((2, 6, 10, cin)),
                            jnp.float32)
            w = jnp.asarray(rng.standard_normal((k, k, cin, cout)),
                            jnp.float32)
            pad = (k - 1) // 2
            ref = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            wf = fold_kernel_w(w)
            pw = (wf.shape[1] - 1) // 2
            xf = x.reshape(2, 6, 5, 2 * cin)
            yf = jax.lax.conv_general_dilated(
                xf, wf, (1, 1), [(pad, pad), (pw, pw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            got = yf.reshape(2, 6, 10, cout)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

    def test_backbone_fold_parity(self):
        # full ResNet-FPN: fold_w=True output == fold_w=False on the SAME
        # params (fp32, random init)
        from treedetection_tpu.models.resnet import ResNetFPN
        rng = jax.random.PRNGKey(0)
        x = jnp.asarray(np.random.default_rng(5)
                        .standard_normal((1, 64, 64, 3)), jnp.float32)
        base = ResNetFPN(depth=50, dtype=jnp.float32, fold_w=False)
        params = base.init(rng, x)
        ref = base.apply(params, x)
        folded = ResNetFPN(depth=50, dtype=jnp.float32, fold_w=True)
        got = folded.apply(params, x)
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_full_model_fold_parity(self, small_model):
        # end-to-end MaskRCNN: same detections with fold_w on/off
        import dataclasses
        model, params = small_model
        x = jnp.asarray(np.random.default_rng(7)
                        .standard_normal((1, 128, 128, 3)), jnp.float32)
        ref = model.apply(params, x)
        fm = MaskRCNN(dataclasses.replace(SMALL, fold_w=True))
        got = fm.apply(params, x)
        np.testing.assert_allclose(np.asarray(got.boxes),
                                   np.asarray(ref.boxes), atol=1e-3)
        assert (np.asarray(got.valid) == np.asarray(ref.valid)).all()
