"""Box math in jnp: IoU matrices, delta transforms, clipping.

Replaces the reference's CuPy all-pairs IoU (reference ``utilities.py:112-144``)
and implements the detectron2-convention box-delta parameterization needed for
weight-converted inference.  Everything is (N, 4) ``[x0, y0, x1, y1]``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# largest box scale change exp(d) allowed — detectron2's clamp log(1000/16)
_SCALE_CLAMP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
           jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def box_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) IoU of two box sets — one fused broadcast, ideal XLA shape.

    The reference computes the same matrix with CuPy broadcasting
    (``utilities.py:112-144``); on TPU this fuses into a handful of VPU ops.
    """
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def pairwise_intersection_over_area(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, M) intersection / area(a) — containment ratio used by the crown
    containment matrix (reference ``postprocessing.py:420-457``)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area = box_area(a)[:, None]
    return jnp.where(area > 0, inter / area, 0.0)


def apply_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray,
                 weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
                 ) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) regression deltas onto anchor/proposal boxes.

    detectron2 ``Box2BoxTransform.apply_deltas`` semantics (weights, scale
    clamp) — required for bit-parity with converted checkpoints.
    """
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, _SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, _SCALE_CLAMP)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([
        pred_ctr_x - 0.5 * pred_w,
        pred_ctr_y - 0.5 * pred_h,
        pred_ctr_x + 0.5 * pred_w,
        pred_ctr_y + 0.5 * pred_h,
    ], axis=-1)


def encode_deltas(src: jnp.ndarray, target: jnp.ndarray,
                  weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
                  ) -> jnp.ndarray:
    """Inverse of :func:`apply_deltas` (used by the training losses)."""
    wx, wy, ww, wh = weights
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    sx = src[..., 0] + 0.5 * sw
    sy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tx = target[..., 0] + 0.5 * tw
    ty = target[..., 1] + 0.5 * th
    eps = 1e-7
    return jnp.stack([
        wx * (tx - sx) / jnp.maximum(sw, eps),
        wy * (ty - sy) / jnp.maximum(sh, eps),
        ww * jnp.log(jnp.maximum(tw, eps) / jnp.maximum(sw, eps)),
        wh * jnp.log(jnp.maximum(th, eps) / jnp.maximum(sh, eps)),
    ], axis=-1)


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, width),
        jnp.clip(boxes[..., 1], 0, height),
        jnp.clip(boxes[..., 2], 0, width),
        jnp.clip(boxes[..., 3], 0, height),
    ], axis=-1)


def transform_pixel_to_geo(coords: jnp.ndarray, affine: jnp.ndarray) -> jnp.ndarray:
    """Batch pixel->geo transform inside jit: ``coords`` (..., 2) as (col, row),
    ``affine`` the 6-vector (a, b, c, d, e, f).  In-jit twin of the reference's
    GPU ``xy_gpu`` (``utilities.py:182-207``) without the host round trips."""
    a, b, c, d, e, f = (affine[i] for i in range(6))
    x = a * coords[..., 0] + b * coords[..., 1] + c
    y = d * coords[..., 0] + e * coords[..., 1] + f
    return jnp.stack([x, y], axis=-1)
