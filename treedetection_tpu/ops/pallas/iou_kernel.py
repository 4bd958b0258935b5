"""Tiled pairwise box-geometry kernels (Pallas TPU).

For N boxes, the dedupe/containment stages need boolean N x N relations
(IoU > t, intersection/area_j >= t, the dedupe conjunction).  At county scale
(N ~ 10^4-10^5) the naive jnp broadcast materializes N^2 fp32 intermediates
in HBM; these kernels stream 128x128 tiles through VMEM and emit only the
thresholded uint8 mask.  All kernels support rectangular (rows-block, all)
shapes so ``postprocessing`` can stream row blocks and extract sparse pairs
without ever holding the full N^2 mask (reference counterpart: the CuPy
all-pairs matrices, reference ``postprocessing.py:349-476``).

Boxes are (N, 4) [x0, y0, x1, y1] float32 (the dedupe kernel takes a 5th
polygon-area column), padded to a multiple of 128 by the wrapper; padding
boxes are empty and produce False rows/cols.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128


def _pad_rows(arr: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    n = arr.shape[0]
    padded = ((n + TILE - 1) // TILE) * TILE
    if padded != n:
        arr = jnp.pad(arr, ((0, padded - n), (0, 0)))
    return arr, n


def _iou_terms(a, b):
    ax0, ay0, ax1, ay1 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx0, by0 = b[:, 0][None, :], b[:, 1][None, :]
    bx1, by1 = b[:, 2][None, :], b[:, 3][None, :]
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax1 - ax0, 0.0) * jnp.maximum(ay1 - ay0, 0.0)
    area_b = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)
    return inter, area_a, area_b


def _iou_tile_kernel(a_ref, b_ref, thr_ref, out_ref):
    """One (TILE, TILE) tile: IoU(a_i, b_j) > thr."""
    inter, area_a, area_b = _iou_terms(a_ref[:], b_ref[:])
    union = area_a + area_b - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    out_ref[:] = (iou > thr_ref[0]).astype(jnp.uint8)


def _containment_tile_kernel(a_ref, b_ref, thr_ref, out_ref):
    """One tile of contains[i, j] = intersection / area_j >= thr."""
    inter, _, area_b = _iou_terms(a_ref[:], b_ref[:])
    ratio = jnp.where(area_b > 0, inter / area_b, 0.0)
    out_ref[:] = (ratio >= thr_ref[0]).astype(jnp.uint8)


def _dedupe_tile_kernel(a_ref, b_ref, thr_ref, out_ref):
    """Dedupe relation (reference ``postprocessing.py:349-406``): bbox IoU
    above threshold AND relative polygon-area difference below threshold.
    Inputs carry the polygon area as a 5th column."""
    a = a_ref[:]
    b = b_ref[:]
    inter, area_a, area_b = _iou_terms(a, b)
    union = area_a + area_b - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    pa = a[:, 4:5]
    pb = b[:, 4][None, :]
    rel = jnp.abs(pa - pb) / jnp.maximum(jnp.maximum(pa, pb), 1e-9)
    out_ref[:] = ((iou > thr_ref[0]) & (rel < thr_ref[1])).astype(jnp.uint8)


def _run_tiled(kernel, a: jnp.ndarray, b: jnp.ndarray, thresholds,
               interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    cols = a.shape[1]
    a_pad, n_a = _pad_rows(a.astype(jnp.float32))
    b_pad, n_b = _pad_rows(b.astype(jnp.float32))
    grid = (a_pad.shape[0] // TILE, b_pad.shape[0] // TILE)
    thr = jnp.asarray(thresholds, dtype=jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((a_pad.shape[0], b_pad.shape[0]),
                                       jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, cols), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, cols), lambda i, j: (j, 0)),
            pl.BlockSpec((len(thresholds),), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=interpret,
    )(a_pad, b_pad, thr)
    return out[:n_a, :n_b]


def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


# jitted wrappers: one fused dispatch per call (an eager op-by-op fallback
# pays a device round trip per op on relay-attached backends) with the
# threshold(s) as traced scalars so one compile serves all settings
@functools.partial(jax.jit)
def _iou_dense(a, b, thr):
    from treedetection_tpu.ops.boxes import box_iou_matrix
    return (box_iou_matrix(a, b) > thr).astype(jnp.uint8)


@functools.partial(jax.jit)
def _containment_dense(a, b, thr):
    from treedetection_tpu.ops.boxes import pairwise_intersection_over_area
    # ratios[j, i] = inter / area_j -> transpose for contains[i, j]
    return (pairwise_intersection_over_area(b, a).T >= thr).astype(jnp.uint8)


@functools.partial(jax.jit)
def _dedupe_dense(a5, b5, iou_thr, area_thr):
    from treedetection_tpu.ops.boxes import box_iou_matrix
    iou = box_iou_matrix(a5[:, :4], b5[:, :4])
    pa = a5[:, 4][:, None]
    pb = b5[:, 4][None, :]
    rel = jnp.abs(pa - pb) / jnp.maximum(jnp.maximum(pa, pb), 1e-9)
    return ((iou > iou_thr) & (rel < area_thr)).astype(jnp.uint8)


def pairwise_iou_mask(boxes: jnp.ndarray, threshold: float,
                      rows: Optional[jnp.ndarray] = None,
                      force_interpret: bool = False) -> jnp.ndarray:
    """(R, N) uint8 mask of IoU(row_i, box_j) > threshold; ``rows`` defaults
    to ``boxes`` (the square case).

    Pallas-tiled on TPU; jnp broadcast fallback on CPU (identical output).
    """
    a = boxes if rows is None else rows
    if _use_pallas() or force_interpret:
        return _run_tiled(_iou_tile_kernel, a, boxes, (threshold,),
                          interpret=force_interpret or not _use_pallas())
    return _iou_dense(a, boxes, threshold)


def pairwise_containment_mask(boxes: jnp.ndarray, threshold: float,
                              rows: Optional[jnp.ndarray] = None,
                              force_interpret: bool = False) -> jnp.ndarray:
    """(R, N) uint8: row_i contains box_j (intersection/area_j >= threshold);
    for the square case the diagonal is cleared."""
    square = rows is None
    a = boxes if rows is None else rows
    if _use_pallas() or force_interpret:
        out = _run_tiled(_containment_tile_kernel, a, boxes, (threshold,),
                         interpret=force_interpret or not _use_pallas())
    else:
        out = _containment_dense(a, boxes, threshold)
    if square:
        n = out.shape[0]
        out = out * (1 - jnp.eye(n, dtype=jnp.uint8))
    return out


def pairwise_dedupe_mask(boxes: jnp.ndarray, areas: jnp.ndarray,
                         iou_threshold: float, area_threshold: float = 0.3,
                         rows: Optional[jnp.ndarray] = None,
                         row_areas: Optional[jnp.ndarray] = None,
                         force_interpret: bool = False) -> jnp.ndarray:
    """(R, N) uint8 dedupe relation: bbox IoU > iou_threshold AND relative
    polygon-area difference < area_threshold."""
    b5 = jnp.concatenate([boxes.astype(jnp.float32),
                          areas.astype(jnp.float32)[:, None]], axis=1)
    if rows is None:
        a5 = b5
    else:
        a5 = jnp.concatenate([rows.astype(jnp.float32),
                              row_areas.astype(jnp.float32)[:, None]], axis=1)
    if _use_pallas() or force_interpret:
        return _run_tiled(_dedupe_tile_kernel, a5, b5,
                          (iou_threshold, area_threshold),
                          interpret=force_interpret or not _use_pallas())
    return _dedupe_dense(a5, b5, iou_threshold, area_threshold)
