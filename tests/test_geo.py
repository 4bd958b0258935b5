"""Geo core tests: affine math and the first-party GeoTIFF codec."""

import numpy as np
import pytest

from treedetection_tpu.geo import Affine, GeoTiff, write_geotiff
from treedetection_tpu.geo.tiff import _lzw_decode, _packbits_decode


class TestAffine:
    def test_apply_and_inverse(self):
        t = Affine.from_origin(1000.0, 2000.0, 0.5, 0.5)
        x, y = t.apply(10, 20)
        assert (x, y) == (1005.0, 1990.0)
        c, r = t.apply_inverse(1005.0, 1990.0)
        assert np.isclose(c, 10) and np.isclose(r, 20)

    def test_batch(self):
        t = Affine.from_origin(0.0, 100.0, 1.0, 2.0)
        xs, ys = t.apply(np.arange(5), np.arange(5))
        assert np.allclose(xs, np.arange(5))
        assert np.allclose(ys, 100 - 2 * np.arange(5))

    def test_mul_identity(self):
        t = Affine.from_origin(10, 20, 0.2, 0.2)
        assert t * Affine.identity() == t
        inv = t.invert()
        prod = t * inv
        assert np.allclose(prod, Affine.identity(), atol=1e-9)

    def test_bounds(self):
        t = Affine.from_origin(100.0, 200.0, 1.0, 1.0)
        assert t.bounds(50, 30) == (100.0, 170.0, 150.0, 200.0)

    def test_window_for_bounds(self):
        t = Affine.from_origin(100.0, 200.0, 1.0, 1.0)
        col, row, w, h = t.window_for_bounds(110.0, 180.0, 120.0, 190.0)
        assert (col, row, w, h) == (10, 10, 10, 10)

    def test_window_transform(self):
        t = Affine.from_origin(100.0, 200.0, 0.5, 0.5)
        wt = t.window_transform(10, 20)
        assert wt.c == 105.0 and wt.f == 190.0


class TestTiffCodec:
    def test_roundtrip_uint8_multiband(self, tmp_path, rng):
        arr = rng.integers(0, 255, (97, 123, 4), dtype=np.uint8)
        t = Affine.from_origin(500000.0, 5400000.0, 0.2, 0.2)
        p = str(tmp_path / "a.tif")
        write_geotiff(p, arr, t, crs=25832, nodata=0)
        g = GeoTiff(p)
        assert (g.width, g.height, g.count) == (123, 97, 4)
        assert g.crs == 25832
        assert g.nodata == 0
        assert np.array_equal(g.read(), arr)
        assert g.transform == t

    def test_roundtrip_float32(self, tmp_path, rng):
        arr = rng.standard_normal((64, 80)).astype(np.float32)
        t = Affine.from_origin(0.0, 64.0, 1.0, 1.0)
        p = str(tmp_path / "f.tif")
        write_geotiff(p, arr, t, crs=25832, nodata=-9999.0)
        g = GeoTiff(p)
        assert g.dtype == np.float32
        assert np.allclose(g.read()[:, :, 0], arr)

    def test_roundtrip_uint16_uncompressed(self, tmp_path, rng):
        arr = rng.integers(0, 65535, (40, 50, 3), dtype=np.uint16)
        p = str(tmp_path / "u16.tif")
        write_geotiff(p, arr, Affine.identity(), compress=None)
        assert np.array_equal(GeoTiff(p).read(), arr)

    def test_windowed_read(self, tmp_path, rng):
        arr = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
        p = str(tmp_path / "w.tif")
        write_geotiff(p, arr, Affine.identity(), rows_per_strip=7)
        g = GeoTiff(p)
        win = g.read((30, 40, 25, 20))
        assert np.array_equal(win, arr[40:60, 30:55])

    def test_boundless_read_pads(self, tmp_path, rng):
        arr = rng.integers(1, 255, (50, 50, 1), dtype=np.uint8)
        p = str(tmp_path / "b.tif")
        write_geotiff(p, arr, Affine.identity())
        g = GeoTiff(p)
        win = g.read((-10, -10, 30, 30), fill_value=0)
        assert win.shape == (30, 30, 1)
        assert (win[:10] == 0).all() and (win[:, :10] == 0).all()
        assert np.array_equal(win[10:, 10:], arr[:20, :20])

    def test_read_bounds(self, tmp_path, rng):
        arr = rng.integers(0, 255, (100, 100, 1), dtype=np.uint8)
        t = Affine.from_origin(1000.0, 1100.0, 1.0, 1.0)
        p = str(tmp_path / "rb.tif")
        write_geotiff(p, arr, t, crs=25832)
        g = GeoTiff(p)
        win, wt = g.read_bounds(1010.0, 1020.0, 1030.0, 1050.0)
        assert win.shape == (30, 20, 1)
        assert np.array_equal(win, arr[50:80, 10:30])
        assert wt.c == 1010.0 and wt.f == 1050.0

    def test_read_scaled_matches_full_resize(self, tmp_path, rng):
        """Strip-chunked decimated read == full read + bilinear resize (same
        half-pixel sampling grid as ops.image.resize_bilinear)."""
        import jax.numpy as jnp
        from treedetection_tpu.ops.image import resize_bilinear
        arr = rng.integers(0, 255, (157, 211, 4), dtype=np.uint8)
        t = Affine.from_origin(500000.0, 5400000.0, 0.2, 0.2)
        p = str(tmp_path / "sc.tif")
        write_geotiff(p, arr, t, crs=25832, rows_per_strip=16)
        g = GeoTiff(p)
        out, new_t = g.read_scaled(31, 42, chunk=13)
        ref = np.asarray(resize_bilinear(
            jnp.asarray(arr.astype(np.float32)), 31, 42))
        assert out.shape == (31, 42, 4)
        assert np.allclose(out, ref, atol=1e-3), np.abs(out - ref).max()
        # rescaled transform preserves the geo bounds
        assert new_t.c == t.c and new_t.f == t.f
        assert new_t.a * 42 == pytest.approx(t.a * 211)
        assert abs(new_t.e) * 31 == pytest.approx(abs(t.e) * 157)

    def test_read_scaled_nodata_to_nan(self, tmp_path, rng):
        arr = (rng.random((60, 60)) * 30).astype(np.float32)
        arr[10:20, 10:20] = -9999.0
        p = str(tmp_path / "nd.tif")
        write_geotiff(p, arr, Affine.from_origin(0.0, 60.0, 1.0, 1.0),
                      crs=25832, nodata=-9999.0)
        out, _ = GeoTiff(p).read_scaled(30, 30, nodata_to_nan=True)
        # the nodata block decimates to NaN, valid area stays finite
        assert np.isnan(out[6:9, 6:9, 0]).all()
        assert np.isfinite(out[20:, 20:, 0]).all()

    def test_reads_reference_sample(self):
        # real-world file produced by GDAL (uncompressed striped float32 COG-ish)
        import os
        path = "/root/reference/data/nDSM/324125317.tif"
        if not os.path.exists(path):
            pytest.skip("reference sample not present")
        g = GeoTiff(path)
        assert (g.width, g.height) == (1000, 1000)
        assert g.crs == 25832
        arr = g.read()
        assert arr.shape == (1000, 1000, 1)
        assert np.isfinite(arr).all()

    def test_packbits(self):
        # literal run + repeat run
        encoded = bytes([2, 10, 20, 30, 254, 7])
        assert _packbits_decode(encoded, 6) == bytes([10, 20, 30, 7, 7, 7])

    def test_lzw_known_stream(self):
        # Encode then decode a synthetic buffer with a tiny reference encoder.
        payload = (b"ABABABABAB" * 50) + bytes(range(256)) * 3
        encoded = _lzw_encode_ref(payload)
        assert _lzw_decode(encoded, len(payload)) == payload


def _lzw_encode_ref(data: bytes) -> bytes:
    """Tiny TIFF-LZW encoder used only to test the decoder."""
    CLEAR, EOI = 256, 257
    out_bits = []
    nbits = 9

    def emit(code):
        out_bits.append((code, nbits))

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << nbits) - 1:
                if nbits < 12:
                    nbits += 1
                else:
                    emit(CLEAR)
                    table = {bytes([i]): i for i in range(256)}
                    next_code = 258
                    nbits = 9
            w = bytes([ch])
    if w:
        emit(table[w])
    emit(EOI)
    # pack MSB-first
    acc, accbits = 0, 0
    out = bytearray()
    for code, nb in out_bits:
        acc = (acc << nb) | code
        accbits += nb
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)
