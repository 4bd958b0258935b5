"""ROI heads: box head (2-FC classifier/regressor) and mask head.

detectron2 ``StandardROIHeads`` with class-specific box regression
(weights 10/10/5/5) and the 4-conv + deconv mask head; all inference paths are
static-shape (fixed proposal and detection budgets).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from treedetection_tpu.ops.boxes import apply_deltas, clip_boxes
from treedetection_tpu.ops.nms import nms_mask

BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class BoxHead(nn.Module):
    """Flatten -> FC 1024 -> FC 1024 -> (cls logits, per-class box deltas)."""
    num_classes: int = 1
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = x.shape[0]
        x = x.reshape(n, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                          name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          name="bbox_pred")(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class MaskHead(nn.Module):
    """4x (3x3 conv 256 + relu) -> 2x deconv -> 1x1 per-class mask logits."""
    num_classes: int = 1
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(4):
            x = nn.relu(nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="deconv")(x))
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="predictor")(x)
        return x.astype(jnp.float32)


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (D, 4)
    scores: jnp.ndarray   # (D,) softmax prob; 0 for padded slots
    classes: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray    # (D,) bool
    src: jnp.ndarray      # (D,) int32 — index of the source proposal (lets
                          # the model trace detection-level pooling quality
                          # back to the box-pool call)


def box_inference(cls_logits: jnp.ndarray, box_deltas: jnp.ndarray,
                  proposals: jnp.ndarray, proposal_scores: jnp.ndarray,
                  image_size: int, score_threshold: float,
                  nms_threshold: float, max_detections: int) -> Detections:
    """detectron2 ``fast_rcnn_inference`` with static shapes, single class.

    ``cls_logits``: (K, C+1); ``box_deltas``: (K, C*4); C == 1 for crowns
    (reference NUM_CLASSES=1, ``config.py:35,59``).
    """
    probs = jax.nn.softmax(cls_logits, axis=-1)[:, 0]  # foreground class 0
    boxes = apply_deltas(box_deltas[:, :4], proposals, BOX_REG_WEIGHTS)
    boxes = clip_boxes(boxes, image_size, image_size)

    valid_proposal = proposal_scores > -jnp.inf
    score_ok = (probs > score_threshold) & valid_proposal
    nms_scores = jnp.where(score_ok, probs, -jnp.inf)
    keep = nms_mask(boxes, nms_scores, nms_threshold)
    final_scores = jnp.where(keep & score_ok, probs, -jnp.inf)
    top_scores, idx = jax.lax.top_k(final_scores, max_detections)
    valid = top_scores > -jnp.inf
    return Detections(
        boxes=boxes[idx],
        scores=jnp.where(valid, top_scores, 0.0),
        classes=jnp.zeros(max_detections, dtype=jnp.int32),
        valid=valid,
        src=idx.astype(jnp.int32),
    )
