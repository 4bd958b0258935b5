"""Tiled pairwise box-geometry kernels (Pallas TPU).

For N boxes, the dedupe/containment stages need boolean N x N relations
(IoU > t, intersection/area_j >= t).  At county scale (N ~ 10^4-10^5) the
naive jnp broadcast materializes N^2 fp32 intermediates in HBM; these kernels
stream 128x128 tiles through VMEM and emit only the thresholded mask.

Boxes are (N, 4) [x0, y0, x1, y1] float32, padded to a multiple of 128 by the
wrapper (padding boxes are empty and produce False rows/cols).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128


def _pad_boxes(boxes: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    n = boxes.shape[0]
    padded = ((n + TILE - 1) // TILE) * TILE
    if padded != n:
        boxes = jnp.pad(boxes, ((0, padded - n), (0, 0)))
    return boxes, n


def _iou_tile_kernel(a_ref, b_ref, thr_ref, out_ref):
    """One (TILE, TILE) tile: IoU(a_i, b_j) > thr."""
    a = a_ref[:]                      # (TILE, 4)
    b = b_ref[:]                      # (TILE, 4)
    thr = thr_ref[0]
    ax0, ay0, ax1, ay1 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx0, by0 = b[:, 0][None, :], b[:, 1][None, :]
    bx1, by1 = b[:, 2][None, :], b[:, 3][None, :]
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax1 - ax0, 0.0) * jnp.maximum(ay1 - ay0, 0.0)
    area_b = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)
    union = area_a + area_b - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    out_ref[:] = (iou > thr).astype(jnp.uint8)


def _containment_tile_kernel(a_ref, b_ref, thr_ref, out_ref):
    """One tile of contains[i, j] = intersection / area_j >= thr."""
    a = a_ref[:]
    b = b_ref[:]
    thr = thr_ref[0]
    ax0, ay0, ax1, ay1 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx0, by0 = b[:, 0][None, :], b[:, 1][None, :]
    bx1, by1 = b[:, 2][None, :], b[:, 3][None, :]
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    area_b = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)
    ratio = jnp.where(area_b > 0, inter / area_b, 0.0)
    out_ref[:] = (ratio >= thr).astype(jnp.uint8)


def _run_tiled(kernel, boxes: jnp.ndarray, threshold: float,
               interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    padded, n = _pad_boxes(boxes.astype(jnp.float32))
    m = padded.shape[0]
    grid = (m // TILE, m // TILE)
    thr = jnp.asarray([threshold], dtype=jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, m), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, 4), lambda i, j: (j, 0)),
            pl.BlockSpec((1,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=interpret,
    )(padded, padded, thr)
    return out[:n, :n]


def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


def pairwise_iou_mask(boxes: jnp.ndarray, threshold: float,
                      force_interpret: bool = False) -> jnp.ndarray:
    """(N, N) uint8 mask of IoU(box_i, box_j) > threshold.

    Pallas-tiled on TPU; jnp broadcast fallback on CPU (identical output).
    """
    if _use_pallas() or force_interpret:
        return _run_tiled(_iou_tile_kernel, boxes, threshold,
                          interpret=force_interpret or not _use_pallas())
    from treedetection_tpu.ops.boxes import box_iou_matrix
    return (box_iou_matrix(boxes, boxes) > threshold).astype(jnp.uint8)


def pairwise_containment_mask(boxes: jnp.ndarray, threshold: float,
                              force_interpret: bool = False) -> jnp.ndarray:
    """(N, N) uint8: box_i contains box_j (intersection/area_j >= threshold,
    diagonal cleared)."""
    if _use_pallas() or force_interpret:
        out = _run_tiled(_containment_tile_kernel, boxes, threshold,
                         interpret=force_interpret or not _use_pallas())
    else:
        from treedetection_tpu.ops.boxes import pairwise_intersection_over_area
        ratios = pairwise_intersection_over_area(boxes, boxes)
        # ratios[i, j] = inter / area_i -> transpose for contains[i, j]
        out = (ratios.T >= threshold).astype(jnp.uint8)
    n = out.shape[0]
    eye = jnp.eye(n, dtype=jnp.uint8)
    return out * (1 - eye)
