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


def _interp_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    """(out, in) bilinear interpolation matrix, half-pixel centers
    (align_corners=False).  Built with numpy at trace time (static shapes)."""
    import numpy as np
    src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    i0 = np.clip(np.floor(src).astype(int), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = np.clip(src - i0, 0.0, 1.0)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - frac)
    np.add.at(m, (rows, i1), frac)
    return jnp.asarray(m)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize (align_corners=False, half-pixel centers) of an HWC or
    NHWC array — matches cv2/torch ``interpolate(..., mode='bilinear')`` used
    for the detectron2 resize transform and mask upsampling
    (reference ``prediction.py:222-227``).

    Implemented as two separable matmuls with static interpolation matrices:
    this puts the resize on the MXU (fast, and avoids gather-based resize
    lowerings that have proven fragile on remote TPU backends).
    """
    batched = img.ndim == 4
    x = img if batched else img[None]
    if x.shape[1] == out_h and x.shape[2] == out_w:
        return img
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    rh = _interp_matrix(out_h, x.shape[1]).astype(dtype)
    rw = _interp_matrix(out_w, x.shape[2]).astype(dtype)
    y = jnp.einsum("oh,bhwc->bowc", rh, x.astype(dtype),
                   preferred_element_type=dtype)
    y = jnp.einsum("pw,bhwc->bhpc", rw, y, preferred_element_type=dtype)
    return y if batched else y[0]


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


# BGR std used when training from random init (torchvision convention);
# converted detectron2-caffe checkpoints use std (1, 1, 1).
TRAIN_PIXEL_STD_BGR = (57.375, 57.12, 58.395)


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
