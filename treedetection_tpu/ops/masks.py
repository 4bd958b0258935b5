"""Mask pasting: 28x28 head outputs -> full-tile binary masks.

detectron2 ``paste_masks_in_image`` semantics: the RxR mask is bilinearly
resampled into its detection box within the tile frame, thresholded at 0.5.
Implemented as an inverse-warp gather per output pixel (static shapes, vmap
over detections) instead of dynamic per-box slicing — XLA-friendly and exactly
equivalent.  The reference does this with ``F.interpolate`` + array writes
(reference ``prediction.py:222-231``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def paste_masks_in_image(masks: jnp.ndarray, boxes: jnp.ndarray,
                         out_h: int, out_w: int,
                         threshold: float = 0.5) -> jnp.ndarray:
    """(N, R, R) soft masks + (N, 4) boxes -> (N, out_h, out_w) bool masks.

    For each output pixel center (x, y) inside the box, sample the mask at the
    corresponding normalized box coordinate (align_corners=False).
    """
    r = masks.shape[-1]

    ys = jnp.arange(out_h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(out_w, dtype=jnp.float32) + 0.5

    def paste_one(mask, box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        w = jnp.maximum(x1 - x0, 1e-3)
        h = jnp.maximum(y1 - y0, 1e-3)
        # normalized [0,1] position inside the box, then to mask pixel coords
        my = (ys - y0) / h * r - 0.5
        mx = (xs - x0) / w * r - 0.5
        inside = ((ys >= y0) & (ys <= y1))[:, None] & ((xs >= x0) & (xs <= x1))[None, :]
        myc = jnp.clip(my, 0.0, r - 1.0)
        mxc = jnp.clip(mx, 0.0, r - 1.0)
        iy0 = jnp.floor(myc).astype(jnp.int32)
        ix0 = jnp.floor(mxc).astype(jnp.int32)
        iy1 = jnp.minimum(iy0 + 1, r - 1)
        ix1 = jnp.minimum(ix0 + 1, r - 1)
        ly = (myc - iy0)[:, None]
        lx = (mxc - ix0)[None, :]
        v00 = mask[iy0[:, None], ix0[None, :]]
        v01 = mask[iy0[:, None], ix1[None, :]]
        v10 = mask[iy1[:, None], ix0[None, :]]
        v11 = mask[iy1[:, None], ix1[None, :]]
        val = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
               + v10 * ly * (1 - lx) + v11 * ly * lx)
        return (val > threshold) & inside

    return jax.vmap(paste_one)(masks, boxes)


def mask_areas(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) -> (N,) pixel areas (used for degenerate-detection filtering)."""
    return masks.sum(axis=(-2, -1))
