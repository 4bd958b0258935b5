"""Fused image preprocessing ops: resize, normalization, NDVI.

These are the jitted replacements for the reference's per-tile host loops:
band reorder + 16->8-bit rescale (reference ``prediction.py:166-167``),
detectron2 resize aug (``prediction.py:169``), and the numba NDVI double loop
(``helpers.py:862-896``).  All fuse into the model's input pipeline under one
``jit`` so normalization rides along with the first conv's HBM read.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize (align_corners=False, half-pixel centers) of an HWC or
    NHWC array — matches cv2/torch ``interpolate(..., mode='bilinear')`` used
    for the detectron2 resize transform and mask upsampling
    (reference ``prediction.py:222-227``)."""
    batched = img.ndim == 4
    x = img if batched else img[None]
    out = jax.image.resize(
        x, (x.shape[0], out_h, out_w, x.shape[3]), method="bilinear")
    return out if batched else out[0]


def ndvi_from_rgbi(rgbi: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """NDVI = (NIR - R) / (NIR + R + eps) from an RGBI array (..., 4).

    Channel convention and /255 scaling follow the reference's numba kernel
    (``helpers.py:862-896``: channel 0 = red, channel 3 = NIR, both scaled by
    255).  One fused jnp expression — vectorizes to the VPU; the reference
    needed a JIT-compiled per-pixel double loop.
    """
    r = rgbi[..., 0].astype(jnp.float32) / 255.0
    nir = rgbi[..., 3].astype(jnp.float32) / 255.0
    return (nir - r) / (nir + r + eps)


def normalize_bgr(rgb: jnp.ndarray,
                  pixel_mean: Tuple[float, ...] = (103.53, 116.28, 123.675),
                  pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)) -> jnp.ndarray:
    """RGB(I) (..., C>=3) uint8/float -> normalized BGR float32 (..., 3).

    detectron2 caffe-convention input: BGR channel order, mean subtraction
    (reference ``prediction.py:166`` reorders to BGR before the model).
    """
    bgr = rgb[..., [2, 1, 0]].astype(jnp.float32)
    mean = jnp.asarray(pixel_mean, dtype=jnp.float32)
    std = jnp.asarray(pixel_std, dtype=jnp.float32)
    return (bgr - mean) / std


def rescale_16bit(img: jnp.ndarray) -> jnp.ndarray:
    """16-bit -> 8-bit range rescale (reference ``prediction.py:167``)."""
    return (img.astype(jnp.float32) / 257.0)


def rgbi_to_model_input(rgbi: jnp.ndarray, out_size: int,
                        pixel_mean: Tuple[float, ...] = (103.53, 116.28, 123.675),
                        pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0),
                        is_16bit: bool = False) -> jnp.ndarray:
    """Fused tile -> model input: optional 16-bit rescale, BGR reorder,
    normalize, resize to the static model resolution.  NHWC in, NHWC out."""
    x = rgbi
    if is_16bit:
        x = rescale_16bit(x)
    x = normalize_bgr(x, pixel_mean, pixel_std)
    if x.shape[-3] != out_size or x.shape[-2] != out_size:
        x = resize_bilinear(x, out_size, out_size)
    return x
