"""Mask R-CNN training losses with static-shape target assignment.

Implements the standard detectron2-style objectives the reference's training
relied on (reference ``supplementary/train_foundation_model.py`` fine-tunes a
detectron2 Mask R-CNN; the loss math lives inside detectron2):

* RPN: binary objectness cross-entropy + smooth-L1 on anchor deltas
  (positive = IoU >= 0.7 with a GT or best-anchor-per-GT, negative = IoU < 0.3)
* ROI box head: softmax cross-entropy (fg/bg) + class-agnostic->specific
  smooth-L1 on deltas of foreground proposals (IoU >= 0.5)
* Mask head: per-pixel BCE against the GT mask roi-aligned to 28x28

Everything static: GT padded to (G,) with a validity mask, anchors/proposals
fixed budgets, losses masked + normalized.  The whole thing vmaps over the
batch and jits.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from treedetection_tpu.ops.boxes import box_iou_matrix, encode_deltas
from treedetection_tpu.ops.roi_align import roi_align
from treedetection_tpu.models.roi_heads import BOX_REG_WEIGHTS


def smooth_l1(x: jnp.ndarray, beta: float = 0.0) -> jnp.ndarray:
    if beta <= 0:
        return jnp.abs(x)
    return jnp.where(jnp.abs(x) < beta, 0.5 * x * x / beta, jnp.abs(x) - 0.5 * beta)


class GroundTruth(NamedTuple):
    boxes: jnp.ndarray    # (G, 4) padded
    masks: jnp.ndarray    # (G, Hm, Wm) binary, in image coords (downsampled ok)
    valid: jnp.ndarray    # (G,) bool


def assign_anchors(anchors: jnp.ndarray, gt: GroundTruth,
                   pos_iou: float = 0.7, neg_iou: float = 0.3
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (labels (A,) in {1 pos, 0 neg, -1 ignore}, matched_gt_idx (A,))."""
    iou = box_iou_matrix(anchors, gt.boxes)                 # (A, G)
    iou = jnp.where(gt.valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.where(best_iou >= pos_iou, 1,
                       jnp.where(best_iou < neg_iou, 0, -1))
    # force-match the best anchor of each GT (ties broadcast like detectron2)
    best_anchor_per_gt = jnp.argmax(iou, axis=0)            # (G,)
    forced = jnp.zeros(anchors.shape[0], dtype=bool).at[best_anchor_per_gt].set(
        gt.valid)
    labels = jnp.where(forced, 1, labels)
    return labels, best_gt


def rpn_loss(logits: Sequence[jnp.ndarray], deltas: Sequence[jnp.ndarray],
             anchors: Sequence[jnp.ndarray], gt: GroundTruth,
             batch_per_image: int = 256) -> Dict[str, jnp.ndarray]:
    """RPN objectness + regression loss for ONE image across all levels."""
    all_logits = jnp.concatenate([l.reshape(-1) for l in logits])
    all_deltas = jnp.concatenate([d.reshape(-1, 4) for d in deltas])
    all_anchors = jnp.concatenate(list(anchors))
    labels, matched = assign_anchors(all_anchors, gt)

    pos = labels == 1
    neg = labels == 0
    n_pos = jnp.maximum(pos.sum(), 1)
    # normalize like detectron2: by batch_per_image instead of sampling —
    # statistically equivalent weighting with static shapes.
    # BCE in logits space (softplus): log(sigmoid(x)) = -softplus(-x).
    # The sigmoid+log form overflows under XLA rewriting at |x| ~ 100+.
    bce_pos = jax.nn.softplus(-all_logits)
    bce_neg = jax.nn.softplus(all_logits)
    # cap negative dominance: weight negatives so pos:neg ~ 1:1 effective
    w_neg = jnp.minimum(1.0, (n_pos / jnp.maximum(neg.sum(), 1)) * 1.0)
    objectness = (jnp.where(pos, bce_pos, 0.0).sum()
                  + w_neg * jnp.where(neg, bce_neg, 0.0).sum()) / batch_per_image

    target = encode_deltas(all_anchors, gt.boxes[matched])
    reg = smooth_l1(all_deltas - target).sum(axis=-1)
    regression = jnp.where(pos, reg, 0.0).sum() / batch_per_image
    return {"rpn_objectness": objectness, "rpn_regression": regression}


def roi_losses(cls_logits: jnp.ndarray, box_deltas: jnp.ndarray,
               mask_logits: jnp.ndarray, proposals: jnp.ndarray,
               proposal_valid: jnp.ndarray, gt: GroundTruth,
               fg_iou: float = 0.5) -> Dict[str, jnp.ndarray]:
    """Box-head CE + smooth-L1 and mask BCE for ONE image.

    ``cls_logits`` (K, 2), ``box_deltas`` (K, 4), ``mask_logits`` (K, R, R)
    computed on ``proposals`` (K, 4).
    """
    iou = box_iou_matrix(proposals, gt.boxes)
    iou = jnp.where(gt.valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = (best_iou >= fg_iou) & proposal_valid
    bg = (best_iou < fg_iou) & proposal_valid

    n_valid = jnp.maximum(proposal_valid.sum(), 1)
    n_fg = jnp.maximum(fg.sum(), 1)

    # classification: class 0 = tree, class 1 = background
    log_probs = jax.nn.log_softmax(cls_logits, axis=-1)
    cls_loss = -(jnp.where(fg, log_probs[:, 0], 0.0)
                 + jnp.where(bg, log_probs[:, 1], 0.0)).sum() / n_valid

    target = encode_deltas(proposals, gt.boxes[best_gt], BOX_REG_WEIGHTS)
    reg = smooth_l1(box_deltas - target).sum(axis=-1)
    box_loss = jnp.where(fg, reg, 0.0).sum() / n_valid

    # mask loss: roi-align the matched GT mask to the proposal at RxR
    r = mask_logits.shape[-1]
    matched_masks = gt.masks[best_gt].astype(jnp.float32)   # (K, Hm, Wm)
    hm, wm = gt.masks.shape[-2], gt.masks.shape[-1]

    def crop_one(m, box):
        return roi_align(m[:, :, None], box[None], r,
                         spatial_scale=1.0, sampling_ratio=2)[0, :, :, 0]

    # scale proposals into mask-raster coords via the caller's convention:
    # gt.masks are at image resolution downsampled by image_size / Hm
    mask_targets = jax.vmap(crop_one)(matched_masks, proposals
                                      * (hm / _image_size_hint(proposals, hm)))
    mask_targets = (mask_targets > 0.5).astype(jnp.float32)
    # stable BCE-with-logits: max(l,0) - l*t + log1p(exp(-|l|))
    l = mask_logits
    bce = (jnp.maximum(l, 0.0) - l * mask_targets
           + jnp.log1p(jnp.exp(-jnp.abs(l))))
    mask_loss = (jnp.where(fg[:, None, None], bce, 0.0).sum()
                 / (n_fg * r * r))
    return {"cls": cls_loss, "box_reg": box_loss, "mask": mask_loss}


def _image_size_hint(proposals: jnp.ndarray, hm: int) -> float:
    # proposals live in model-input pixel coords; the caller supplies GT masks
    # at a fixed fraction of the input size.  We infer the ratio statically
    # from the training config: masks are input_size // MASK_DOWNSAMPLE.
    return float(hm * MASK_DOWNSAMPLE)


MASK_DOWNSAMPLE = 4  # GT masks stored at input_size/4 (config of train step)


def mask_rcnn_losses(model, params, images: jnp.ndarray, gt_boxes: jnp.ndarray,
                     gt_masks: jnp.ndarray, gt_valid: jnp.ndarray,
                     rng: jax.Array) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full training loss for a batch.

    ``images`` (B, S, S, 3) normalized; ``gt_boxes`` (B, G, 4) in input-pixel
    coords; ``gt_masks`` (B, G, S/4, S/4) binary; ``gt_valid`` (B, G).
    Runs backbone+RPN, generates proposals (stop-gradient), computes heads on
    proposals + GT boxes, and returns the summed loss dict.
    """
    from treedetection_tpu.models.rpn import generate_proposals
    from treedetection_tpu.ops.roi_align import multilevel_roi_align
    from treedetection_tpu.models.mask_rcnn import FPN_STRIDES

    cfg = model.cfg

    def apply_fn(p, x):
        return model.apply(p, x, method=_forward_features)

    feats, logits, deltas = model.apply(params, images,
                                        method=_forward_features)
    anchors = [jnp.asarray(a) for a in _anchors_for(cfg)]

    def per_image(f_img, lg_img, dl_img, boxes_i, masks_i, valid_i):
        gt = GroundTruth(boxes=boxes_i, masks=masks_i, valid=valid_i)
        rpn = rpn_loss(lg_img, dl_img, anchors, gt)
        props = generate_proposals(
            [jax.lax.stop_gradient(l) for l in lg_img],
            [jax.lax.stop_gradient(d) for d in dl_img],
            anchors, cfg.input_size,
            cfg.rpn_pre_nms_topk, cfg.rpn_post_nms_topk, cfg.rpn_nms_threshold)
        # append GT boxes so positives always exist (detectron2 behavior)
        prop_boxes = jnp.concatenate([props.boxes, boxes_i])
        prop_valid = jnp.concatenate([props.scores > -jnp.inf, valid_i])
        # pallas=False: the Pallas pooling kernel has no VJP; training needs
        # gradients to flow through the pooled features into the backbone
        pooled = multilevel_roi_align(
            [x.astype(jnp.float32) for x in f_img[:4]], prop_boxes,
            cfg.box_pool, FPN_STRIDES[:4], pallas=False)
        cls_logits, box_deltas = model.apply(
            params, pooled.astype(cfg.dtype), method=_apply_box_head)
        mask_pooled = multilevel_roi_align(
            [x.astype(jnp.float32) for x in f_img[:4]], prop_boxes,
            cfg.mask_pool, FPN_STRIDES[:4], pallas=False)
        mask_logits = model.apply(
            params, mask_pooled.astype(cfg.dtype), method=_apply_mask_head
        )[..., 0]
        roi = roi_losses(cls_logits, box_deltas[:, :4], mask_logits,
                         prop_boxes, prop_valid, gt)
        return {**rpn, **roi}

    losses = jax.vmap(per_image)(feats, logits, deltas,
                                 gt_boxes, gt_masks, gt_valid)
    mean_losses = {k: v.mean() for k, v in losses.items()}
    total = sum(mean_losses.values())
    return total, mean_losses


# --- module-method helpers (bound methods for model.apply) -------------------

def _forward_features(self, images):
    feats = self.backbone(images.astype(self.cfg.dtype))
    logits, deltas = self.rpn_head(feats)
    return feats, logits, deltas


def _apply_box_head(self, pooled):
    return self.box_head(pooled)


def _apply_mask_head(self, pooled):
    return self.mask_head(pooled)


def _anchors_for(cfg):
    # iota-generated on device (not embedded constants) — keeps the train
    # step's serialized executable small, same as the inference forward
    from treedetection_tpu.models.anchors import pyramid_anchors_jnp
    from treedetection_tpu.models.mask_rcnn import FPN_STRIDES
    return pyramid_anchors_jnp(cfg.input_size, FPN_STRIDES)
