"""Static-shape greedy NMS compiled to XLA.

The reference relies on detectron2's CUDA NMS inside the model and shapely
dedupe outside.  On TPU, NMS must have static shapes: we compute the full
(N, N) IoU matrix on the MXU-friendly broadcast path and run the greedy scan
as a ``lax.fori_loop`` over a suppression mask — O(N^2) work, zero dynamic
shapes, differentiable-adjacent (mask output).  Padded entries are handled by
giving them ``-inf`` scores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from treedetection_tpu.ops.boxes import box_iou_matrix


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS -> bool keep-mask in the ORIGINAL box order.

    Exact greedy semantics (same result as torchvision/detectron2 NMS):
    boxes are visited in descending score order; a box is kept iff it is not
    suppressed by an earlier kept box with IoU > threshold.  Entries with
    ``scores == -inf`` are never kept.

    TPU-shaped algorithm: greedy keep is the unique fixpoint of
    ``keep[i] = not any(j < i and keep[j] and iou[j, i] > t)``.  Iterating that
    map from all-true stabilizes decision "layers" prefix-first (keep[i]
    depends only on j < i), so each sweep is one fully-parallel (N, N) masked
    reduction on the VPU and the while_loop exits after the suppression-chain
    depth (single digits in practice) instead of N sequential steps.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    sorted_scores = scores[order]
    iou = box_iou_matrix(sorted_boxes, sorted_boxes)
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)  # j < i pairs (j rows)
    suppress = (iou > iou_threshold) & upper
    valid = sorted_scores > -jnp.inf

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < n)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(suppress & keep[:, None], axis=0)
        return new, keep, it + 1

    keep0 = valid
    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.asarray(0)))
    return jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, idxs: jnp.ndarray,
                iou_threshold: float) -> jnp.ndarray:
    """Class/level-aware NMS via the coordinate-offset trick (boxes of
    different ``idxs`` never overlap)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold)


def top_k_after_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                    keep: jnp.ndarray, k: int):
    """Select the k highest-scoring kept entries, padding with -inf scores.

    Returns (boxes (k,4), scores (k,), source_indices (k,)) — the static-shape
    bridge between NMS and downstream heads.
    """
    masked = jnp.where(keep, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(masked, k)
    return boxes[idx], top_scores, idx
