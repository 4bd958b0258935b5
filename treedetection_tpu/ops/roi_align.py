"""ROIAlign (aligned / "V2" semantics) as vectorized XLA gathers.

Replaces detectron2's CUDA ROIAlign (the core of its ROI heads).  Design:

* **aligned=True** continuous-coordinate convention (half-pixel shift), the
  detectron2 default the tree models were trained with.
* **static sampling grid** — detectron2 uses ``sampling_ratio=0`` (adaptive
  per-box grids), which is dynamic-shape-hostile; we fix a 2x2 grid per bin,
  the value detectron2 resolves to for the typical proposal/bin ratio.
* **multilevel** pooling stacks the FPN levels into one padded (L, H, W, C)
  array so each box gathers from its assigned level in a single pass instead
  of computing every level and selecting (4x less gather traffic).

The bilinear gather lowers to XLA ``gather`` + fused arithmetic; a Pallas
double-buffered variant can slot in behind the same signature if gathers ever
dominate a profile (they don't for 1000 proposals x 7x7 bins — the conv
backbone does).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(fmap: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample ``fmap`` (H, W, C) at continuous (ys, xs) of any shape -> (..., C).

    Points outside [-1, H/W] contribute 0 (matching ROIAlign's zero padding);
    sampling treats pixel centers as integer coordinates.
    """
    h, w = fmap.shape[0], fmap.shape[1]
    # ROIAlign zeroes samples strictly outside; inside, clamp edge coords.
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]
    v00 = fmap[y0, x0]
    v01 = fmap[y0, x1]
    v10 = fmap[y1, x0]
    v11 = fmap[y1, x1]
    out = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
           + v10 * ly * (1 - lx) + v11 * ly * lx)
    return jnp.where(valid[..., None], out, 0.0)


def _sample_grid(boxes: jnp.ndarray, spatial_scale, resolution: int,
                 sampling_ratio: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Continuous sampling coordinates for all boxes.

    Returns (ys, xs) of shape (N, R, R, S, S) in feature-map coordinates.
    ``spatial_scale`` may be scalar or per-box (N,) for multilevel pooling.
    """
    scale = jnp.asarray(spatial_scale)
    if scale.ndim == 0:
        scale = jnp.broadcast_to(scale, (boxes.shape[0],))
    sboxes = boxes * scale[:, None]
    x0 = sboxes[:, 0] - 0.5
    y0 = sboxes[:, 1] - 0.5
    roi_w = sboxes[:, 2] - sboxes[:, 0]
    roi_h = sboxes[:, 3] - sboxes[:, 1]
    bin_w = roi_w / resolution
    bin_h = roi_h / resolution
    r = jnp.arange(resolution, dtype=boxes.dtype)
    s = (jnp.arange(sampling_ratio, dtype=boxes.dtype) + 0.5) / sampling_ratio
    # offset within roi for bin i, sample k: (i + s_k) * bin
    off = r[:, None] + s[None, :]                      # (R, S)
    ys = y0[:, None, None] + off[None] * bin_h[:, None, None]   # (N, R, S)
    xs = x0[:, None, None] + off[None] * bin_w[:, None, None]
    ys = jnp.broadcast_to(ys[:, :, None, :, None],
                          (boxes.shape[0], resolution, resolution,
                           sampling_ratio, sampling_ratio))
    xs = jnp.broadcast_to(xs[:, None, :, None, :],
                          (boxes.shape[0], resolution, resolution,
                           sampling_ratio, sampling_ratio))
    return ys, xs


def roi_align(fmap: jnp.ndarray, boxes: jnp.ndarray, resolution: int,
              spatial_scale: float, sampling_ratio: int = 2) -> jnp.ndarray:
    """ROIAlign on one feature map -> (N, R, R, C)."""
    ys, xs = _sample_grid(boxes, spatial_scale, resolution, sampling_ratio)
    samples = _bilinear_gather(fmap, ys, xs)          # (N, R, R, S, S, C)
    return samples.mean(axis=(3, 4))


def assign_fpn_levels(boxes: jnp.ndarray, min_level: int = 2, max_level: int = 5,
                      canonical_size: float = 224.0, canonical_level: int = 4
                      ) -> jnp.ndarray:
    """FPN level per box: floor(L0 + log2(sqrt(area)/224)), clamped.

    detectron2 ``assign_boxes_to_levels`` formula.
    """
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
           jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    size = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(size / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def multilevel_roi_align(fmaps: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         resolution: int, strides: Sequence[int],
                         sampling_ratio: int = 2) -> jnp.ndarray:
    """Pool each box from its assigned FPN level -> (N, R, R, C).

    ``fmaps``: P2..P5 feature maps, (H_l, W_l, C), H halving per level.
    Implementation: flatten every level to rows and concatenate into ONE
    (sum HW, C) buffer; each sample point turns into a flat row index
    ``base[level] + row * W_level + col``.  The four bilinear corners become
    four row-gathers from the flat buffer — no padded (L, H0, W0, C) stack
    (which costs 4x the feature memory and was the HBM hog at batch 8),
    and row-gathers with the channel dim contiguous are the layout XLA's TPU
    gather handles best.
    """
    L = len(fmaps)
    C = fmaps[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, C) for f in fmaps], axis=0)
    hs = np.asarray([f.shape[0] for f in fmaps])
    ws = np.asarray([f.shape[1] for f in fmaps])
    bases = np.concatenate([[0], np.cumsum(hs * ws)[:-1]])

    levels = assign_fpn_levels(boxes, min_level=2, max_level=2 + L - 1)
    scales = 1.0 / jnp.asarray(strides, dtype=boxes.dtype)
    ys, xs = _sample_grid(boxes, scales[levels], resolution, sampling_ratio)

    h = jnp.asarray(hs)[levels][:, None, None, None, None]
    w = jnp.asarray(ws)[levels][:, None, None, None, None]
    base = jnp.asarray(bases)[levels][:, None, None, None, None]
    hf = h.astype(boxes.dtype)
    wf = w.astype(boxes.dtype)
    valid = (ys > -1.0) & (ys < hf) & (xs > -1.0) & (xs < wf)
    y = jnp.clip(ys, 0.0, hf - 1.0)
    x = jnp.clip(xs, 0.0, wf - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]

    def rows(yy, xx):
        idx = (base + yy * w + xx).reshape(-1)
        return flat[idx].reshape((*yy.shape, C))

    out = (rows(y0, x0) * (1 - ly) * (1 - lx)
           + rows(y0, x1) * (1 - ly) * lx
           + rows(y1, x0) * ly * (1 - lx)
           + rows(y1, x1) * ly * lx)
    out = jnp.where(valid[..., None], out, 0.0)
    return out.mean(axis=(3, 4))
