"""Op-level tests: box math, NMS vs greedy oracle, ROIAlign vs numpy oracle,
mask pasting, image transforms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from treedetection_tpu.ops import (
    apply_deltas, batched_nms, box_iou_matrix, clip_boxes, ndvi_from_rgbi,
    nms_mask, normalize_bgr, paste_masks_in_image, resize_bilinear, roi_align,
    multilevel_roi_align,
)
from treedetection_tpu.ops.boxes import encode_deltas, pairwise_intersection_over_area


def nms_oracle(boxes, scores, thresh):
    """Plain-python greedy NMS."""
    order = np.argsort(-scores)
    keep = np.zeros(len(boxes), dtype=bool)
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i] or scores[i] == -np.inf:
            continue
        keep[i] = True
        for j in order:
            if j == i or suppressed[j] or keep[j]:
                continue
            # iou
            x0 = max(boxes[i, 0], boxes[j, 0]); y0 = max(boxes[i, 1], boxes[j, 1])
            x1 = min(boxes[i, 2], boxes[j, 2]); y1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(x1 - x0, 0) * max(y1 - y0, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter) > thresh:
                suppressed[j] = True
    return keep


class TestBoxes:
    def test_iou_matrix(self):
        a = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15]], dtype=jnp.float32)
        iou = box_iou_matrix(a, a)
        assert np.allclose(np.diag(np.asarray(iou)), 1.0)
        assert abs(float(iou[0, 1]) - 25 / 175) < 1e-6

    def test_deltas_roundtrip(self):
        rng = np.random.default_rng(0)
        src = rng.uniform(0, 100, (20, 2))
        src = np.concatenate([src, src + rng.uniform(5, 50, (20, 2))], axis=1)
        tgt = rng.uniform(0, 100, (20, 2))
        tgt = np.concatenate([tgt, tgt + rng.uniform(5, 50, (20, 2))], axis=1)
        w = (10.0, 10.0, 5.0, 5.0)
        d = encode_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
        back = apply_deltas(d, jnp.asarray(src), w)
        assert np.allclose(np.asarray(back), tgt, atol=1e-3)

    def test_clip(self):
        b = jnp.array([[-5, -5, 2000, 900]], dtype=jnp.float32)
        out = clip_boxes(b, 1024, 1024)
        assert np.allclose(np.asarray(out), [[0, 0, 1024, 900]])

    def test_containment_ratio(self):
        a = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)   # small
        b = jnp.array([[0, 0, 100, 100]], dtype=jnp.float32)  # big
        r = pairwise_intersection_over_area(a, b)
        assert float(r[0, 0]) == 1.0  # a fully inside b


class TestNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_greedy_oracle(self, seed):
        rng = np.random.default_rng(seed)
        n = 200
        centers = rng.uniform(20, 200, (n, 2))
        sizes = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               axis=1).astype(np.float32)
        scores = rng.random(n).astype(np.float32)
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        expected = nms_oracle(boxes, scores, 0.5)
        assert np.array_equal(keep, expected)

    def test_padded_entries_never_kept(self):
        boxes = jnp.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=jnp.float32)
        scores = jnp.array([0.9, -jnp.inf])
        keep = nms_mask(boxes, scores, 0.5)
        assert np.asarray(keep).tolist() == [True, False]

    def test_batched_nms_classes_dont_suppress(self):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
        scores = jnp.array([0.9, 0.8])
        same = nms_mask(boxes, scores, 0.5)
        assert np.asarray(same).tolist() == [True, False]
        cross = batched_nms(boxes, scores, jnp.array([0, 1]), 0.5)
        assert np.asarray(cross).tolist() == [True, True]


def roi_align_oracle(fmap, box, resolution, scale, sr):
    """Direct numpy implementation of aligned ROIAlign for one box."""
    h, w, c = fmap.shape
    x0 = box[0] * scale - 0.5
    y0 = box[1] * scale - 0.5
    bw = (box[2] - box[0]) * scale / resolution
    bh = (box[3] - box[1]) * scale / resolution
    out = np.zeros((resolution, resolution, c))
    for i in range(resolution):
        for j in range(resolution):
            acc = np.zeros(c)
            for ky in range(sr):
                for kx in range(sr):
                    y = y0 + (i + (ky + 0.5) / sr) * bh
                    x = x0 + (j + (kx + 0.5) / sr) * bw
                    if y < -1 or y > h or x < -1 or x > w:
                        continue
                    y_ = min(max(y, 0), h - 1)
                    x_ = min(max(x, 0), w - 1)
                    iy, ix = int(np.floor(y_)), int(np.floor(x_))
                    iy1, ix1 = min(iy + 1, h - 1), min(ix + 1, w - 1)
                    ly, lx = y_ - iy, x_ - ix
                    acc += (fmap[iy, ix] * (1 - ly) * (1 - lx)
                            + fmap[iy, ix1] * (1 - ly) * lx
                            + fmap[iy1, ix] * ly * (1 - lx)
                            + fmap[iy1, ix1] * ly * lx)
            out[i, j] = acc / (sr * sr)
    return out


class TestROIAlign:
    def test_constant_map(self):
        fmap = jnp.full((32, 32, 8), 3.5)
        boxes = jnp.array([[8, 8, 24, 24]], dtype=jnp.float32)
        out = roi_align(fmap, boxes, 7, 1.0)
        assert np.allclose(np.asarray(out), 3.5, atol=1e-5)

    def test_matches_oracle(self):
        rng = np.random.default_rng(1)
        fmap = rng.standard_normal((16, 16, 4)).astype(np.float32)
        box = np.array([4.3, 2.1, 50.9, 40.7], dtype=np.float32)
        got = np.asarray(roi_align(jnp.asarray(fmap), jnp.asarray(box[None]),
                                   7, 0.25, sampling_ratio=2))[0]
        want = roi_align_oracle(fmap, box, 7, 0.25, 2)
        assert np.allclose(got, want, atol=1e-4)

    def test_multilevel_routes_by_size(self):
        # small box -> P2; huge box -> P5
        fmaps = [jnp.full((256 // (2 ** i), 256 // (2 ** i), 2), float(i))
                 for i in range(4)]
        boxes = jnp.array([[10, 10, 40, 40],          # ~30px -> level 2 (idx 0)
                           [0, 0, 1000, 1000]],       # 1000px -> level 5 (idx 3)
                          dtype=jnp.float32)
        out = np.asarray(multilevel_roi_align(fmaps, boxes, 7, (4, 8, 16, 32)))
        assert np.allclose(out[0], 0.0, atol=1e-5)
        assert np.allclose(out[1], 3.0, atol=1e-5)


class TestMasks:
    def test_paste_full_box(self):
        masks = jnp.ones((1, 28, 28))
        boxes = jnp.array([[10, 20, 40, 50]], dtype=jnp.float32)
        out = np.asarray(paste_masks_in_image(masks, boxes, 64, 64))
        ys, xs = np.where(out[0])
        assert xs.min() >= 10 and xs.max() <= 40
        assert ys.min() >= 20 and ys.max() <= 50
        assert out[0].sum() >= 28 * 28  # ~30x30 box fully on

    def test_paste_half_mask(self):
        m = np.zeros((28, 28), dtype=np.float32)
        m[:, 14:] = 1.0  # right half
        out = np.asarray(paste_masks_in_image(
            jnp.asarray(m[None]), jnp.array([[0, 0, 28, 28]], dtype=jnp.float32),
            28, 28))
        frac = out[0][:, 16:].mean()
        assert frac > 0.95
        assert out[0][:, :12].mean() < 0.05


class TestImageOps:
    def test_ndvi(self):
        rgbi = jnp.zeros((4, 4, 4)).at[..., 0].set(50).at[..., 3].set(150)
        ndvi = np.asarray(ndvi_from_rgbi(rgbi))
        assert np.allclose(ndvi, (150 - 50) / (150 + 50), atol=1e-4)

    def test_normalize_bgr_order(self):
        rgb = jnp.zeros((2, 2, 3)).at[..., 0].set(255.0)  # pure red
        out = np.asarray(normalize_bgr(rgb))
        # BGR: channel 2 should now carry the red signal
        assert out[0, 0, 2] == pytest.approx(255.0 - 123.675)
        assert out[0, 0, 0] == pytest.approx(-103.53)

    def test_resize(self):
        img = jnp.arange(16.0).reshape(4, 4, 1)
        up = resize_bilinear(img, 8, 8)
        assert up.shape == (8, 8, 1)
        assert abs(float(up.mean()) - float(img.mean())) < 0.3


class TestPatchROIAlign:
    """The patch-matmul multilevel pooler must match the gather oracle."""

    def _fmaps(self, base=64, c=16, seed=0):
        rng = np.random.default_rng(seed)
        return [jnp.asarray(rng.standard_normal(
            (base // (2 ** i), base // (2 ** i), c)).astype(np.float32))
            for i in range(4)]

    def _boxes(self, n=50, img=256, seed=1, max_aspect=2.0):
        rng = np.random.default_rng(seed)
        cx = rng.uniform(0, img, n)
        cy = rng.uniform(0, img, n)
        size = rng.uniform(8, img / 2, n)
        aspect = rng.uniform(1 / max_aspect, max_aspect, n)
        w = size * np.sqrt(aspect)
        h = size / np.sqrt(aspect)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        return jnp.asarray(np.clip(boxes, 0, img).astype(np.float32))

    def test_matches_gather_oracle(self):
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align, multilevel_roi_align_gather)
        fmaps = self._fmaps()
        boxes = self._boxes()
        fast = np.asarray(multilevel_roi_align(fmaps, boxes, 7, (4, 8, 16, 32)))
        ref = np.asarray(multilevel_roi_align_gather(fmaps, boxes, 7,
                                                     (4, 8, 16, 32)))
        assert np.allclose(fast, ref, atol=2e-5), np.abs(fast - ref).max()

    def test_matches_gather_14x14(self):
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align, multilevel_roi_align_gather)
        fmaps = self._fmaps(seed=3)
        boxes = self._boxes(n=20, seed=4)
        fast = np.asarray(multilevel_roi_align(fmaps, boxes, 14, (4, 8, 16, 32)))
        ref = np.asarray(multilevel_roi_align_gather(fmaps, boxes, 14,
                                                     (4, 8, 16, 32)))
        assert np.allclose(fast, ref, atol=2e-5)

    def test_chunked_path(self):
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align, multilevel_roi_align_gather)
        fmaps = self._fmaps(seed=5)
        boxes = self._boxes(n=300, seed=6)  # > chunk size -> lax.map path
        fast = np.asarray(multilevel_roi_align(fmaps, boxes, 7, (4, 8, 16, 32),
                                               chunk=128))
        ref = np.asarray(multilevel_roi_align_gather(fmaps, boxes, 7,
                                                     (4, 8, 16, 32)))
        assert np.allclose(fast, ref, atol=2e-5)

    def test_edge_boxes(self):
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align, multilevel_roi_align_gather)
        fmaps = self._fmaps(seed=7)
        boxes = jnp.asarray([[0.0, 0.0, 30.0, 30.0],       # image corner
                             [226.0, 226.0, 256.0, 256.0],  # far corner
                             [0.0, 120.0, 256.0, 140.0]],   # full-width strip
                            dtype=jnp.float32)
        fast = np.asarray(multilevel_roi_align(fmaps, boxes, 7, (4, 8, 16, 32)))
        ref = np.asarray(multilevel_roi_align_gather(fmaps, boxes, 7,
                                                     (4, 8, 16, 32)))
        # the 12.8:1 strip exceeds the PATCH span -> per-box gather fallback
        # makes it exact too
        assert np.allclose(fast, ref, atol=2e-5), np.abs(fast - ref).max()

    def test_high_aspect_boxes_exact(self):
        """Aspect ratios 3-8 at every level: the out-of-span fallback must
        reproduce the gather path exactly (no truncated bins)."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align, multilevel_roi_align_gather)
        fmaps = self._fmaps(seed=8)
        rng = np.random.default_rng(9)
        rows = []
        # sqrt(area) band per level: L2 <56, L3 [56,112), L4 [112,224), L5 >=224
        for size in (50.0, 100.0, 200.0, 300.0):
            for aspect in (3.0, 5.0, 8.0):
                w = size * np.sqrt(aspect)
                h = size / np.sqrt(aspect)
                cx, cy = rng.uniform(50, 200, 2)
                rows.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
                rows.append([cx - h / 2, cy - w / 2, cx + h / 2, cy + w / 2])
        boxes = jnp.asarray(np.asarray(rows, dtype=np.float32))
        fast = np.asarray(multilevel_roi_align(fmaps, boxes, 7, (4, 8, 16, 32)))
        ref = np.asarray(multilevel_roi_align_gather(fmaps, boxes, 7,
                                                     (4, 8, 16, 32)))
        assert np.allclose(fast, ref, atol=2e-5), np.abs(fast - ref).max()

    def test_overflow_beyond_budget_bounded(self):
        """More overflow boxes than FALLBACK_BUDGET: excess keeps truncated
        pooling (finite, and exact on the non-overhanging bins) — and the
        degradation is OBSERVABLE via the returned overflow count +
        report_overflow_host's logged warning/tally."""
        from treedetection_tpu.ops.roi_align import (
            FALLBACK_BUDGET, OVERFLOW_STATS, multilevel_roi_align,
            report_overflow_host)
        OVERFLOW_STATS.update(events=0, boxes_beyond_budget=0)
        fmaps = self._fmaps(seed=10)
        n = FALLBACK_BUDGET + 8
        boxes = jnp.asarray(
            np.stack([np.zeros(n), 10.0 + np.arange(n),
                      np.full(n, 256.0), 30.0 + np.arange(n)], 1
                     ).astype(np.float32))  # 256x20 strips, aspect 12.8
        out, n_over = multilevel_roi_align(fmaps, boxes, 7, (4, 8, 16, 32),
                                           return_overflow=True)
        assert np.isfinite(np.asarray(out)).all()
        # FALLBACK_BUDGET strips were re-pooled exactly; the count is the
        # number left truncated after the fixup
        assert int(n_over) == n - FALLBACK_BUDGET
        report_overflow_host(int(n_over))
        assert OVERFLOW_STATS["events"] == 1
        assert OVERFLOW_STATS["boxes_beyond_budget"] == 8

    def test_truncation_count_warns_precisely(self):
        """roi_overflow counts boxes left truncated AFTER every fixup: zero
        is silent, any positive count warns by exactly that amount."""
        from treedetection_tpu.ops.roi_align import (
            OVERFLOW_STATS, report_overflow_host)
        OVERFLOW_STATS.update(events=0, boxes_beyond_budget=0)
        report_overflow_host(0)
        assert OVERFLOW_STATS["events"] == 0
        report_overflow_host(3)
        assert OVERFLOW_STATS["events"] == 1
        assert OVERFLOW_STATS["boxes_beyond_budget"] == 3

    def test_no_overflow_no_warning(self):
        from treedetection_tpu.ops.roi_align import (
            OVERFLOW_STATS, multilevel_roi_align, report_overflow_host)
        OVERFLOW_STATS.update(events=0, boxes_beyond_budget=0)
        _, n_over = multilevel_roi_align(self._fmaps(seed=11),
                                         self._boxes(n=30, seed=12), 7,
                                         (4, 8, 16, 32),
                                         return_overflow=True)
        report_overflow_host(int(n_over))
        assert OVERFLOW_STATS["events"] == 0

    def test_model_output_carries_overflow(self):
        """The overflow count rides the ModelOutput so the Predictor's flush
        can check it for free (no extra device fetch, no host callback that
        would break persistent-cache serialization)."""
        from treedetection_tpu.models.mask_rcnn import (
            MaskRCNNConfig, create_model)
        cfg = MaskRCNNConfig(depth=50, input_size=64, rpn_pre_nms_topk=32,
                             rpn_post_nms_topk=16, max_detections=4,
                             bf16=False)
        model, params = create_model(cfg)
        out = model.apply(params, jnp.zeros((1, 64, 64, 3)))
        assert out.roi_overflow.shape == (1,)
        assert out.roi_overflow.dtype == jnp.int32

    def test_degraded_counter_counts_valid_detections_only(self, monkeypatch):
        """roi_overflow == per-image count of VALID detections whose box-pool
        (traced via the detection's source proposal) OR mask-pool features
        stayed truncated; invalid (padded) detection slots never count."""
        import functools
        from treedetection_tpu.models import mask_rcnn as mr
        real = mr.multilevel_roi_align_batched

        def fake(box_trunc, mask_trunc, fmaps, boxes, res, strides,
                 return_inexact_mask=False, **kw):
            out = real(fmaps, boxes, res, strides)
            B, N = boxes.shape[0], boxes.shape[1]
            flag = box_trunc if res <= 8 else mask_trunc
            if return_inexact_mask:
                return out, jnp.full((B, N), flag, dtype=bool)
            return out

        cfg = mr.MaskRCNNConfig(depth=50, input_size=64, rpn_pre_nms_topk=32,
                                rpn_post_nms_topk=16, max_detections=4,
                                bf16=False, score_threshold=0.0)
        model, params = mr.create_model(cfg)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32))
        for box_t, mask_t in ((False, False), (True, False),
                              (False, True), (True, True)):
            monkeypatch.setattr(mr, "multilevel_roi_align_batched",
                                functools.partial(fake, box_t, mask_t))
            out = model.apply(params, x)
            n_valid = np.asarray(out.valid).sum(axis=1)
            want = n_valid if (box_t or mask_t) else np.zeros_like(n_valid)
            np.testing.assert_array_equal(
                np.asarray(out.roi_overflow), want.astype(np.int32)), \
                (box_t, mask_t)
            # prop_overflow is the SEPARATE truncated-top-quartile-proposal
            # signal (ADVICE r4: the two counters must not be conflated):
            # box-pool truncation flags every proposal incl. the top quartile
            K = cfg.rpn_post_nms_topk
            want_prop = (np.full_like(n_valid, max(K // 4, 1)) if box_t
                         else np.zeros_like(n_valid))
            np.testing.assert_array_equal(
                np.asarray(out.prop_overflow), want_prop.astype(np.int32))

    def test_packed_transport_roundtrip_bit_exact(self):
        """ops.pack single-buffer transport: pack on device, unpack on host,
        every leaf bit-exact — including NaN/inf/-0 payloads (bitcast, not a
        numeric cast)."""
        import jax
        from treedetection_tpu.models.mask_rcnn import ModelOutput
        from treedetection_tpu.ops.pack import (
            pack_model_output, packed_width, unpack_model_output)
        rng = np.random.default_rng(7)
        B, D, R = 3, 7, 28
        boxes = (rng.normal(size=(B, D, 4)) * 100).astype(np.float32)
        boxes[0, 0] = [np.nan, np.inf, -np.inf, -0.0]
        out = ModelOutput(
            boxes=jnp.asarray(boxes),
            scores=jnp.asarray(rng.uniform(size=(B, D)).astype(np.float32)),
            classes=jnp.asarray(rng.integers(0, 5, (B, D)), dtype=jnp.int32),
            valid=jnp.asarray(rng.integers(0, 2, (B, D)).astype(bool)),
            masks=jnp.asarray(rng.integers(0, 256, (B, D, R, R)),
                              dtype=jnp.uint8),
            roi_overflow=jnp.asarray(rng.integers(0, 100, (B,)),
                                     dtype=jnp.int32),
            prop_overflow=jnp.asarray(rng.integers(0, 100, (B,)),
                                      dtype=jnp.int32))
        packed = jax.jit(pack_model_output)(out)
        assert packed.dtype == jnp.uint8
        assert packed.shape == (B, packed_width(D, R))
        got = unpack_model_output(np.asarray(packed), D, R)
        np.testing.assert_array_equal(
            np.asarray(out.boxes).view(np.uint32),
            got.boxes.view(np.uint32))  # bit-level (NaN-safe) comparison
        np.testing.assert_array_equal(np.asarray(out.scores), got.scores)
        np.testing.assert_array_equal(np.asarray(out.classes), got.classes)
        np.testing.assert_array_equal(np.asarray(out.valid), got.valid)
        np.testing.assert_array_equal(np.asarray(out.masks), got.masks)
        np.testing.assert_array_equal(np.asarray(out.roi_overflow),
                                      got.roi_overflow)
        np.testing.assert_array_equal(np.asarray(out.prop_overflow),
                                      got.prop_overflow)

    def test_pallas_kernel_interpret_matches_gather(self):
        """CPU coverage for the Pallas patch-DMA kernel (ADVICE r2): the TPU
        interpreter emulates the async-copy/semaphore semantics, so the DMA
        origins + hat-matrix contractions are pinned against the gather
        oracle without a chip."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align, multilevel_roi_align_gather)
        fmaps = self._fmaps(seed=13)
        boxes = self._boxes(n=40, seed=14)
        fast = np.asarray(multilevel_roi_align(
            fmaps, boxes, 7, (4, 8, 16, 32), pallas=True,
            force_interpret=True))
        ref = np.asarray(multilevel_roi_align_gather(fmaps, boxes, 7,
                                                     (4, 8, 16, 32)))
        assert np.allclose(fast, ref, atol=2e-5), np.abs(fast - ref).max()

    def test_pallas_kernel_interpret_slots1(self, monkeypatch):
        """TD_ROI_SLOTS=1 (serial DMA pipeline): the prologue must issue no
        copy — a prologue copy double-issues box 0 and leaks a semaphore
        increment, so every later wait returns one copy early."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align, multilevel_roi_align_gather)
        monkeypatch.setenv("TD_ROI_SLOTS", "1")
        fmaps = self._fmaps(seed=21)
        boxes = self._boxes(n=24, seed=22)
        fast = np.asarray(multilevel_roi_align(
            fmaps, boxes, 7, (4, 8, 16, 32), pallas=True,
            force_interpret=True))
        ref = np.asarray(multilevel_roi_align_gather(fmaps, boxes, 7,
                                                     (4, 8, 16, 32)))
        assert np.allclose(fast, ref, atol=2e-5), np.abs(fast - ref).max()

    def test_pallas_kernel_interpret_14x14(self):
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align, multilevel_roi_align_gather)
        fmaps = self._fmaps(seed=15)
        boxes = self._boxes(n=12, seed=16)
        fast = np.asarray(multilevel_roi_align(
            fmaps, boxes, 14, (4, 8, 16, 32), pallas=True,
            force_interpret=True))
        ref = np.asarray(multilevel_roi_align_gather(fmaps, boxes, 14,
                                                     (4, 8, 16, 32)))
        assert np.allclose(fast, ref, atol=2e-5), np.abs(fast - ref).max()

    def _batched_mixed_boxes(self, strips=True):
        """(B=2, N=24) boxes spanning the patch classes: small (fit the
        SMALL_PATCH window), large (25-28 cells on their level, need the
        48-patch overlay), and — when ``strips`` — one high-aspect strip per
        image (outspans even the large patch -> gather fallback)."""
        rng = np.random.default_rng(30)
        imgs = []
        for b in range(2):
            rows = []
            for _ in range(18):     # small: 20-60 px -> <= 15 cells at P2
                cx, cy = rng.uniform(40, 216, 2)
                s = rng.uniform(20, 60)
                rows.append([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2])
            for _ in range(5 if strips else 6):
                # large: 100-110 px -> 25-28 cells at P2
                cx, cy = rng.uniform(60, 196, 2)
                s = rng.uniform(100, 110)
                rows.append([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2])
            if strips:
                y = rng.uniform(40, 200)
                rows.append([0.0, y, 256.0, y + 20.0])  # aspect-12.8 strip
            imgs.append(np.clip(np.asarray(rows, dtype=np.float32), 0, 256))
        return jnp.asarray(np.stack(imgs))

    def test_batched_overlay_interpret_matches_gather(self, monkeypatch):
        """The two-class (small patch + large overlay) batched pooler must be
        EXACT whenever the non-fitting count stays within the large budget:
        parity with the per-image gather oracle across all three classes, and
        zero truncation counts."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align_batched, multilevel_roi_align_gather)
        monkeypatch.setenv("TD_ROI_SMALL", "16")  # opt into the small class
        monkeypatch.setenv("TD_ROI_LARGE_FRAC", "0.5")  # budget >= non-fitting
        fmaps1 = self._fmaps(seed=31)
        fmaps2 = self._fmaps(seed=32)
        fmaps = [jnp.stack([a, b]) for a, b in zip(fmaps1, fmaps2)]
        boxes = self._batched_mixed_boxes()
        fast, n_over = multilevel_roi_align_batched(
            fmaps, boxes, 7, (4, 8, 16, 32), pallas=True,
            force_interpret=True, return_overflow=True)
        assert np.asarray(n_over).tolist() == [0, 0]
        for b, fm in enumerate((fmaps1, fmaps2)):
            ref = np.asarray(multilevel_roi_align_gather(
                fm, boxes[b], 7, (4, 8, 16, 32)))
            assert np.allclose(np.asarray(fast[b]), ref, atol=2e-5), \
                np.abs(np.asarray(fast[b]) - ref).max()

    def test_batched_overlay_beyond_budget_counted(self, monkeypatch):
        """Non-fitting boxes beyond the large budget keep truncated
        small-patch pooling — finite output, and the per-image count reports
        exactly the boxes left truncated."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align_batched)
        monkeypatch.setenv("TD_ROI_LARGE_FRAC", "0.05")  # 2 per image of 24
        monkeypatch.setenv("TD_ROI_EXACT_FRAC", "0")     # no gather tail
        monkeypatch.setenv("TD_ROI_SMALL", "24")  # 20-60px fit, 100-110 don't
        fmaps1 = self._fmaps(seed=33)
        fmaps2 = self._fmaps(seed=34)
        fmaps = [jnp.stack([a, b]) for a, b in zip(fmaps1, fmaps2)]
        boxes = self._batched_mixed_boxes(strips=False)  # 6 need-large / img
        out, n_over = multilevel_roi_align_batched(
            fmaps, boxes, 7, (4, 8, 16, 32), pallas=True,
            force_interpret=True, return_overflow=True)
        assert np.isfinite(np.asarray(out)).all()
        # 6 boxes per image want the large patch; the per-image budget
        # ceil(24 * 0.05) = 2 serves two of them, the exact tail is off ->
        # exactly 4 stay truncated per image
        assert np.asarray(n_over).tolist() == [4, 4]

    def test_batched_exact_tail_serves_any_span(self, monkeypatch):
        """The gather tail pools boxes that outspan even the 48-patch (the
        elongated junk proposals) EXACTLY — no budgeted fallback left behind:
        batched output == per-image gather oracle, zero truncations."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align_batched, multilevel_roi_align_gather)
        monkeypatch.setenv("TD_ROI_SMALL", "16")
        monkeypatch.setenv("TD_ROI_LARGE_FRAC", "0.5")
        monkeypatch.setenv("TD_ROI_EXACT_FRAC", "0.25")
        fmaps1 = self._fmaps(seed=40)
        fmaps2 = self._fmaps(seed=41)
        fmaps = [jnp.stack([a, b]) for a, b in zip(fmaps1, fmaps2)]
        boxes = self._batched_mixed_boxes(strips=True)  # 1 strip per image
        fast, n_over = multilevel_roi_align_batched(
            fmaps, boxes, 7, (4, 8, 16, 32), pallas=True,
            force_interpret=True, return_overflow=True)
        assert np.asarray(n_over).tolist() == [0, 0]
        for b, fm in enumerate((fmaps1, fmaps2)):
            ref = np.asarray(multilevel_roi_align_gather(
                fm, boxes[b], 7, (4, 8, 16, 32)))
            assert np.allclose(np.asarray(fast[b]), ref, atol=2e-5), \
                np.abs(np.asarray(fast[b]) - ref).max()

    def test_batched_budgets_are_per_image(self, monkeypatch):
        """A box-heavy image cannot starve a later image's budgets: image 0
        carries 6 need-large boxes, image 1 only 2 — with per-image budgets
        of 2 (large) + 0 (exact), image 1's two are both served while a
        flattened batch-wide top-k would have spent all 4 slots on image 0."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align_batched)
        monkeypatch.setenv("TD_ROI_SMALL", "24")
        monkeypatch.setenv("TD_ROI_LARGE_FRAC", "0.05")  # ceil(24*.05) = 2
        monkeypatch.setenv("TD_ROI_EXACT_FRAC", "0")
        fmaps1 = self._fmaps(seed=42)
        fmaps2 = self._fmaps(seed=43)
        fmaps = [jnp.stack([a, b]) for a, b in zip(fmaps1, fmaps2)]
        boxes = np.array(self._batched_mixed_boxes(strips=False))
        # shrink 4 of image 1's 6 large boxes so it needs only 2
        for i in range(18, 22):
            x0, y0 = boxes[1, i, 0], boxes[1, i, 1]
            boxes[1, i] = [x0, y0, x0 + 40, y0 + 40]
        _, n_over = multilevel_roi_align_batched(
            fmaps, jnp.asarray(boxes), 7, (4, 8, 16, 32), pallas=True,
            force_interpret=True, return_overflow=True)
        assert np.asarray(n_over).tolist() == [4, 0]

    def test_batched_overlay_disabled_matches_gather(self, monkeypatch):
        """The production DEFAULT path (all-48 patch-DMA kernel + exact
        tail) matches the gather oracle."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align_batched, multilevel_roi_align_gather)
        monkeypatch.setenv("TD_ROI_SMALL", "0")
        fmaps1 = self._fmaps(seed=35)
        fmaps2 = self._fmaps(seed=36)
        fmaps = [jnp.stack([a, b]) for a, b in zip(fmaps1, fmaps2)]
        boxes = self._batched_mixed_boxes()
        fast, n_over = multilevel_roi_align_batched(
            fmaps, boxes, 7, (4, 8, 16, 32), pallas=True,
            force_interpret=True, return_overflow=True)
        assert np.asarray(n_over).tolist() == [0, 0]
        for b, fm in enumerate((fmaps1, fmaps2)):
            ref = np.asarray(multilevel_roi_align_gather(
                fm, boxes[b], 7, (4, 8, 16, 32)))
            assert np.allclose(np.asarray(fast[b]), ref, atol=2e-5)

    @pytest.mark.parametrize("mode", ("whole", "split"))
    def test_batched_resident_variants_match_gather(self, monkeypatch, mode):
        """The opt-in VMEM-resident kernel (TD_ROI_RESIDENT=1), whole-C and
        under a forced C-split, matches the gather oracle on the all-48
        path."""
        from treedetection_tpu.ops.roi_align import (
            multilevel_roi_align_batched, multilevel_roi_align_gather)
        monkeypatch.setenv("TD_ROI_SMALL", "0")
        monkeypatch.setenv("TD_ROI_RESIDENT", "1")
        if mode == "split":
            # budget below the whole-C footprint but above the C/2 one ->
            # the c_split=2 grid path runs
            from treedetection_tpu.ops.pallas.roi_align_kernel import (
                resident_vmem_bytes)
            full = resident_vmem_bytes([64, 32, 16, 8], [64, 32, 16, 8],
                                       16, 48, 4)
            # below full-C + margin, above half-C + margin -> c_split=2
            monkeypatch.setenv("TD_ROI_VMEM_MB",
                               str((full * 0.75 + (32 << 20)) / (1 << 20)))
        fmaps1 = self._fmaps(seed=37)
        fmaps2 = self._fmaps(seed=38)
        fmaps = [jnp.stack([a, b]) for a, b in zip(fmaps1, fmaps2)]
        boxes = self._batched_mixed_boxes()
        fast, n_over = multilevel_roi_align_batched(
            fmaps, boxes, 7, (4, 8, 16, 32), pallas=True,
            force_interpret=True, return_overflow=True)
        assert np.asarray(n_over).tolist() == [0, 0]
        for b, fm in enumerate((fmaps1, fmaps2)):
            ref = np.asarray(multilevel_roi_align_gather(
                fm, boxes[b], 7, (4, 8, 16, 32)))
            assert np.allclose(np.asarray(fast[b]), ref, atol=2e-5)


class TestFusedRasterStats:
    def test_two_raster_fusion_matches_single_calls(self):
        """polygon_raster_stats_two == two polygon_raster_stats_batch calls
        (shared PIP, per-raster affines on DIFFERENT grids)."""
        from treedetection_tpu.ops.stats import (
            polygon_raster_stats_batch, polygon_raster_stats_two)
        rng = np.random.default_rng(7)
        polys = np.full((5, 12, 2), np.nan, dtype=np.float32)
        for i in range(5):
            n = rng.integers(3, 10)
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            r = rng.uniform(3, 12)
            cx, cy = rng.uniform(20, 80, 2)
            polys[i, :n, 0] = cx + r * np.cos(ang)
            polys[i, :n, 1] = cy + r * np.sin(ang)
        ra = rng.standard_normal((100, 100)).astype(np.float32)
        rb = rng.standard_normal((20, 20)).astype(np.float32)
        aff_a = np.array([1.0, 0, 0, 0, -1.0, 100.0], dtype=np.float32)
        aff_b = np.array([5.0, 0, 0, 0, -5.0, 100.0], dtype=np.float32)
        pa, pb = (jnp.asarray(x) for x in (ra, rb))
        aa, ab = (jnp.asarray(x) for x in (aff_a, aff_b))
        pj = jnp.asarray(polys)
        fa, fb = polygon_raster_stats_two(pj, pa, aa, pb, ab)
        sa = polygon_raster_stats_batch(pj, pa, aa)
        sb = polygon_raster_stats_batch(pj, pb, ab)
        for got, want in ((fa, sa), (fb, sb)):
            for g, w in zip(got, want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-6, atol=1e-6)

    def _random_polys(self, n=24, seed=7, lo=5, hi=95, rmax=12):
        rng = np.random.default_rng(seed)
        polys = np.full((n, 14, 2), np.nan, dtype=np.float32)
        rings = []
        for i in range(n):
            k = int(rng.integers(3, 12))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            r = rng.uniform(2, rmax)
            cx, cy = rng.uniform(lo, hi, 2)
            ring = np.stack([cx + r * np.cos(ang),
                             cy + r * np.sin(ang)], axis=1)
            polys[i, :k] = ring
            # f32-rounded so host-twin (f64) and device (f32) PIP tests see
            # identical vertex coords — borderline samples must agree
            rings.append(polys[i, :k].astype(np.float64))
        return polys, rings

    @pytest.mark.parametrize("compat", (False, True))
    def test_patch_path_matches_gather_path(self, compat):
        """The patch-path stats ops (per-polygon raster windows + hat
        contractions, no scattered gathers) == the gather-path ops for
        axis-aligned affines, incl. raster-edge clamping, out-of-raster
        NaNs, and nodata-NaN cells."""
        from treedetection_tpu.ops.stats import (
            polygon_raster_stats_batch, polygon_raster_stats_batch_patch,
            polygon_raster_stats_two, polygon_raster_stats_two_patch)
        rng = np.random.default_rng(11)
        # polys near the raster edges too (lo=2) -> border clamping active
        polys, _ = self._random_polys(seed=11, lo=2, hi=98)
        ra = rng.standard_normal((100, 100)).astype(np.float32)
        ra[40:43, 60:70] = np.nan                     # nodata hole
        rb = rng.standard_normal((20, 20)).astype(np.float32)
        aff_a = np.array([1.0, 0, 0, 0, -1.0, 100.0], dtype=np.float32)
        aff_b = np.array([5.0, 0, 0, 0, -5.0, 100.0], dtype=np.float32)
        pj = jnp.asarray(polys)
        pa, pb = jnp.asarray(ra), jnp.asarray(rb)
        aa, ab = jnp.asarray(aff_a), jnp.asarray(aff_b)
        def check(got_s, want_s):
            # argmax_xy may pick a different of two float-tied max samples
            # (the hat contraction sums in a different order than the 4-tap
            # formula); every VALUE stat must match
            for name in ("max", "min", "mean", "var", "count"):
                np.testing.assert_allclose(
                    np.asarray(getattr(got_s, name)),
                    np.asarray(getattr(want_s, name)),
                    rtol=1e-4, atol=1e-4, err_msg=name)
            same = np.isclose(np.asarray(got_s.argmax_xy),
                              np.asarray(want_s.argmax_xy),
                              rtol=1e-4, atol=1e-4).all(axis=1)
            assert same.mean() >= 0.85, "argmax flipped beyond float ties"

        want = polygon_raster_stats_batch(pj, pa, aa, compat_circle=compat)
        got = polygon_raster_stats_batch_patch(pj, pa, aa, patch=48,
                                               compat_circle=compat)
        check(got, want)
        wa, wb = polygon_raster_stats_two(pj, pa, aa, pb, ab,
                                          compat_circle=compat)
        ga, gb = polygon_raster_stats_two_patch(pj, pa, aa, pb, ab,
                                                patch_a=48, patch_b=20,
                                                compat_circle=compat)
        check(ga, wa)
        check(gb, wb)

    def test_host_twin_matches_device_op(self):
        """_host_polygon_raster_stats (the over-span fallback) == the
        device gather op, per polygon."""
        from treedetection_tpu.ops.stats import polygon_raster_stats_batch
        from treedetection_tpu.postprocessing import (
            _host_polygon_raster_stats)
        from treedetection_tpu.geo import Affine
        rng = np.random.default_rng(13)
        polys, rings = self._random_polys(seed=13, lo=2, hi=98)
        ra = rng.standard_normal((100, 100)).astype(np.float32)
        aff = np.array([1.0, 0, 0, 0, -1.0, 100.0], dtype=np.float32)
        want = polygon_raster_stats_batch(
            jnp.asarray(polys), jnp.asarray(ra), jnp.asarray(aff))
        affine = Affine(1.0, 0, 0, 0, -1.0, 100.0)
        for i, ring in enumerate(rings):
            mx, mean, var, am, cnt = _host_polygon_raster_stats(
                ring, ra, affine)
            assert cnt == int(np.asarray(want.count)[i])
            np.testing.assert_allclose(mx, float(np.asarray(want.max)[i]),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(mean,
                                       float(np.asarray(want.mean)[i]),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(var, float(np.asarray(want.var)[i]),
                                       rtol=1e-4, atol=1e-5)
