"""Native contour tracer + LZW tests (vs cv2 / pure-python oracles)."""

import numpy as np
import pytest

from treedetection_tpu.native import get_lib, lzw_decode, trace_contours


needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="native toolchain unavailable")


def fill_ring(ring, h, w):
    """Rasterize an integer pixel ring the cv2 way (boundary pixels included)."""
    import cv2
    img = np.zeros((h, w), dtype=np.uint8)
    cv2.drawContours(img, [ring.reshape(-1, 1, 2).astype(np.int32)], -1, 1,
                     thickness=cv2.FILLED)
    return img


class TestContours:
    def test_rectangle(self):
        mask = np.zeros((20, 20), dtype=np.uint8)
        mask[5:15, 3:12] = 1
        rings = trace_contours(mask)
        assert len(rings) == 1
        r = rings[0]
        assert r[:, 0].min() == 3 and r[:, 0].max() == 11
        assert r[:, 1].min() == 5 and r[:, 1].max() == 14
        # CHAIN_APPROX_SIMPLE-style: a rectangle compresses to 4 corners
        assert len(r) <= 8

    def test_two_components(self):
        mask = np.zeros((30, 30), dtype=np.uint8)
        mask[2:8, 2:8] = 1
        mask[15:25, 10:20] = 1
        rings = trace_contours(mask)
        assert len(rings) == 2

    @needs_native
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_blob_coverage_matches_cv2(self, seed):
        import cv2
        rng = np.random.default_rng(seed)
        mask = (rng.random((64, 64)) > 0.75).astype(np.uint8)
        mask = cv2.dilate(mask, np.ones((5, 5), np.uint8))  # merge into blobs
        mask = cv2.erode(mask, np.ones((3, 3), np.uint8))
        ours = trace_contours(mask, include_holes=False)
        ref, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        # same number of outer contours
        assert len(ours) == len(ref)
        # filled union reproduces the mask's outer shape
        filled = np.zeros_like(mask)
        for r in ours:
            filled |= fill_ring(r, *mask.shape)
        ref_filled = np.zeros_like(mask)
        for r in ref:
            ref_filled |= fill_ring(r.reshape(-1, 2), *mask.shape)
        assert np.array_equal(filled, ref_filled)

    def test_single_pixel(self):
        mask = np.zeros((5, 5), dtype=np.uint8)
        mask[2, 2] = 1
        rings = trace_contours(mask)
        assert len(rings) == 1
        assert np.array_equal(rings[0][0], [2, 2])

    def test_empty_mask(self):
        assert trace_contours(np.zeros((10, 10), dtype=np.uint8)) == []


@needs_native
class TestNativeLZW:
    def test_roundtrip_with_python_decoder(self):
        from tests.test_geo import _lzw_encode_ref
        payload = bytes(np.random.default_rng(0).integers(0, 40, 5000,
                                                          dtype=np.uint8))
        encoded = _lzw_encode_ref(payload)
        out = lzw_decode(encoded, len(payload))
        assert out == payload

    def test_repetitive_payload(self):
        from tests.test_geo import _lzw_encode_ref
        payload = b"\x00" * 10000 + bytes(range(256)) * 8
        encoded = _lzw_encode_ref(payload)
        assert lzw_decode(encoded, len(payload)) == payload


class TestResizeThreshold:
    def test_matches_numpy_fallback(self):
        from treedetection_tpu.native import get_lib, resize_threshold_mask
        from treedetection_tpu.prediction import _resize_mask_np
        rng = np.random.default_rng(0)
        soft = rng.integers(0, 255, (28, 28), dtype=np.uint8)
        for oh, ow in ((28, 28), (90, 61), (7, 150), (300, 300)):
            got = resize_threshold_mask(soft, oh, ow)
            want = (_resize_mask_np(soft.astype(np.float32), oh, ow)
                    > 127.5).astype(np.uint8)
            if get_lib() is None:
                assert np.array_equal(got, want)  # fallback path trivially
            else:
                # float32 C path vs float64 numpy: only boundary-epsilon
                # pixels may differ
                assert (got != want).mean() < 0.02, (oh, ow)

    def test_binary_mask_passthrough(self):
        from treedetection_tpu.native import resize_threshold_mask
        m = np.zeros((28, 28), dtype=np.uint8)
        m[8:20, 8:20] = 255
        out = resize_threshold_mask(m, 56, 56)
        assert out.dtype == np.uint8
        assert set(np.unique(out)) <= {0, 1}
        assert out[28, 28] == 1 and out[2, 2] == 0


@needs_native
class TestSimplifyDP:
    def test_bit_identical_to_numpy(self):
        """Native DP keep-set must equal the numpy stack DP exactly
        (the stitching hot loop routes through the native path)."""
        from treedetection_tpu import native
        from treedetection_tpu.vector import polygon as P
        rng = np.random.default_rng(7)
        for _ in range(60):
            n = int(rng.integers(3, 300))
            th = np.sort(rng.uniform(0, 2 * np.pi, n))
            r = rng.uniform(3, 12, n)
            ring = np.stack([500000 + r * np.cos(th),
                             5400000 + r * np.sin(th)], 1)
            tol = float(rng.choice([0.0, 0.05, 0.2, 2.0]))
            got = P.simplify_polygon(ring, tol)
            orig = native.simplify_keep_flags
            native.simplify_keep_flags = lambda *a, **k: None
            try:
                want = P.simplify_polygon(ring, tol)
            finally:
                native.simplify_keep_flags = orig
            assert got.shape == want.shape and np.array_equal(got, want)

    def test_degenerate_rings(self):
        from treedetection_tpu.vector.polygon import simplify_polygon
        # collinear, tiny, duplicate-point rings must not crash or drop below
        # a valid closed ring
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=np.float64)
        out = simplify_polygon(sq, 0.5)
        assert np.array_equal(out[0], out[-1]) and len(out) >= 4
        line = np.array([[0, 0], [5, 0], [10, 0]], dtype=np.float64)
        out = simplify_polygon(line, 0.5)
        assert np.array_equal(out[0], out[-1])
