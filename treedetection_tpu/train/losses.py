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
    # force-match the best anchor of each GT (ties broadcast like detectron2).
    # Scatter with MAX, not set: every padding GT's argmax lands on anchor 0,
    # and a duplicate-index set scatter is nondeterministic — a valid GT whose
    # best anchor is also anchor 0 could lose its forced positive to the
    # padding row's False.
    best_anchor_per_gt = jnp.argmax(iou, axis=0)            # (G,)
    forced = jnp.zeros(anchors.shape[0], dtype=jnp.int32).at[
        best_anchor_per_gt].max(gt.valid.astype(jnp.int32)) > 0
    labels = jnp.where(forced, 1, labels)
    return labels, best_gt


def rpn_loss(logits: Sequence[jnp.ndarray], deltas: Sequence[jnp.ndarray],
             anchors: Sequence[jnp.ndarray], gt: GroundTruth,
             batch_per_image: int = 256,
             pos_fraction: float = 0.5) -> Dict[str, jnp.ndarray]:
    """RPN objectness + regression loss for ONE image across all levels."""
    all_logits = jnp.concatenate([l.reshape(-1) for l in logits])
    all_deltas = jnp.concatenate([d.reshape(-1, 4) for d in deltas])
    all_anchors = jnp.concatenate(list(anchors))
    labels, matched = assign_anchors(all_anchors, gt)

    pos = labels == 1
    neg = labels == 0
    n_pos = jnp.maximum(pos.sum(), 1)
    n_neg = jnp.maximum(neg.sum(), 1)
    # detectron2 samples batch_per_image anchors with at most
    # pos_fraction positives and fills the REST with negatives; with static
    # shapes we keep every anchor and reproduce the sampler's expected
    # weighting: each positive counts min(1, cap/n_pos), the negatives
    # together count (batch_per_image - n_pos_eff).  (An earlier 1:1
    # pos:neg cap underweighted negatives ~25x vs detectron2 with the
    # typical handful of positives — the RPN over-fired and flooded the box
    # head with junk whole-image proposals.)
    pos_cap = batch_per_image * pos_fraction
    n_pos_eff = jnp.minimum(n_pos.astype(jnp.float32), pos_cap)
    w_pos = jnp.minimum(1.0, pos_cap / n_pos)
    w_neg = jnp.minimum(1.0, (batch_per_image - n_pos_eff) / n_neg)
    # BCE in logits space (softplus): log(sigmoid(x)) = -softplus(-x).
    # The sigmoid+log form overflows under XLA rewriting at |x| ~ 100+.
    bce_pos = jax.nn.softplus(-all_logits)
    bce_neg = jax.nn.softplus(all_logits)
    objectness = (w_pos * jnp.where(pos, bce_pos, 0.0).sum()
                  + w_neg * jnp.where(neg, bce_neg, 0.0).sum()) / batch_per_image

    target = encode_deltas(all_anchors, gt.boxes[matched])
    reg = smooth_l1(all_deltas - target).sum(axis=-1)
    regression = w_pos * jnp.where(pos, reg, 0.0).sum() / batch_per_image
    return {"rpn_objectness": objectness, "rpn_regression": regression}


# detectron2's ROI-head sampler: 512 proposals per image, at most 25% fg.
# With static shapes we keep every proposal and reproduce the sampler's
# EXPECTED weighting instead: fg weight min(1, 128/n_fg), bg weight
# (512 - n_fg_eff)/n_bg, normalized by 512 — the same statistical trick
# rpn_loss documents for batch_per_image.
ROI_BATCH_PER_IMAGE = 512
ROI_FG_CAP = 128            # 25% of 512
MASK_FG_BUDGET = 128        # static mask-loss subset (d2 pools only sampled fg)
MASK_DOWNSAMPLE = 4         # GT masks stored at input_size/4


def assign_proposals(proposals: jnp.ndarray, proposal_valid: jnp.ndarray,
                     gt: GroundTruth, fg_iou: float = 0.5):
    """-> (fg, bg, best_gt) for the ROI heads of ONE image."""
    iou = box_iou_matrix(proposals, gt.boxes)
    iou = jnp.where(gt.valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    fg = (best_iou >= fg_iou) & proposal_valid
    bg = (best_iou < fg_iou) & proposal_valid
    return fg, bg, best_gt, best_iou


def roi_box_losses(cls_logits: jnp.ndarray, box_deltas: jnp.ndarray,
                   proposals: jnp.ndarray, fg: jnp.ndarray, bg: jnp.ndarray,
                   best_gt: jnp.ndarray, gt: GroundTruth
                   ) -> Dict[str, jnp.ndarray]:
    """Box-head CE + smooth-L1 for ONE image (``cls_logits`` (K, 2),
    ``box_deltas`` (K, 4) on ``proposals`` (K, 4))."""
    n_fg = jnp.maximum(fg.sum(), 1)
    n_bg = jnp.maximum(bg.sum(), 1)
    n_fg_eff = jnp.minimum(n_fg, ROI_FG_CAP)
    w_fg = jnp.minimum(1.0, ROI_FG_CAP / n_fg)
    w_bg = jnp.minimum(1.0, (ROI_BATCH_PER_IMAGE - n_fg_eff) / n_bg)

    # classification: class 0 = tree, class 1 = background.  Without the
    # sampler weighting, ~1000 bg proposals would outvote a handful of fg
    # ~100:1 and bias the head toward background.
    log_probs = jax.nn.log_softmax(cls_logits, axis=-1)
    cls_loss = -(w_fg * jnp.where(fg, log_probs[:, 0], 0.0).sum()
                 + w_bg * jnp.where(bg, log_probs[:, 1], 0.0).sum()
                 ) / ROI_BATCH_PER_IMAGE

    target = encode_deltas(proposals, gt.boxes[best_gt], BOX_REG_WEIGHTS)
    reg = smooth_l1(box_deltas - target).sum(axis=-1)
    box_loss = w_fg * jnp.where(fg, reg, 0.0).sum() / ROI_BATCH_PER_IMAGE
    return {"cls": cls_loss, "box_reg": box_loss}


def roi_mask_loss(mask_logits: jnp.ndarray, proposals: jnp.ndarray,
                  fg: jnp.ndarray, best_gt: jnp.ndarray, gt: GroundTruth
                  ) -> jnp.ndarray:
    """Mask BCE on an (M,)-selected proposal subset: roi-align the matched
    GT mask (stored at input_size/MASK_DOWNSAMPLE) to each proposal at RxR.
    Callers pass only the fg-budget subset — gathering the GT masks for all
    ~1k proposals would materialize hundreds of MB per image in the VJP."""
    r = mask_logits.shape[-1]
    hm = gt.masks.shape[-2]
    assert gt.masks.shape[-1] == hm, "square GT mask rasters expected"
    matched_masks = gt.masks[best_gt].astype(jnp.float32)   # (M, Hm, Wm)

    def crop_one(m, box):
        return roi_align(m[:, :, None], box[None], r,
                         spatial_scale=1.0, sampling_ratio=2)[0, :, :, 0]

    mask_targets = jax.vmap(crop_one)(matched_masks,
                                      proposals / MASK_DOWNSAMPLE)
    mask_targets = (mask_targets > 0.5).astype(jnp.float32)
    # stable BCE-with-logits: max(l,0) - l*t + log1p(exp(-|l|))
    l = mask_logits
    bce = (jnp.maximum(l, 0.0) - l * mask_targets
           + jnp.log1p(jnp.exp(-jnp.abs(l))))
    n_fg = jnp.maximum(fg.sum(), 1)
    return jnp.where(fg[:, None, None], bce, 0.0).sum() / (n_fg * r * r)


def mask_rcnn_losses(model, params, images: jnp.ndarray, gt_boxes: jnp.ndarray,
                     gt_masks: jnp.ndarray, gt_valid: jnp.ndarray,
                     rng: jax.Array, return_state: bool = False):
    """Full training loss for a batch -> (total, parts) — or, with
    ``return_state=True``, (total, (parts, mutable_updates)) where
    ``mutable_updates`` carries the backbone's updated ``batch_stats`` when
    the model trains with real batch norm (``cfg.norm == "batch"``; empty
    otherwise).  Callers in batch-norm mode must pass the full variables
    dict (params + batch_stats) and thread the updates.

    ``images`` (B, S, S, 3) normalized; ``gt_boxes`` (B, G, 4) in input-pixel
    coords; ``gt_masks`` (B, G, S/4, S/4) binary; ``gt_valid`` (B, G).
    Runs backbone+RPN, generates proposals (stop-gradient), computes heads on
    proposals + GT boxes, and returns the summed loss dict.
    """
    from treedetection_tpu.models.rpn import generate_proposals
    from treedetection_tpu.ops.roi_align import multilevel_roi_align
    from treedetection_tpu.models.mask_rcnn import FPN_STRIDES

    cfg = model.cfg

    if cfg.norm == "batch":
        (feats, logits, deltas), mut = model.apply(
            params, images, method=_forward_features,
            mutable=["batch_stats"])
    else:
        feats, logits, deltas = model.apply(params, images,
                                            method=_forward_features)
        mut = {}
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
        fg, bg, best_gt, best_iou = assign_proposals(prop_boxes, prop_valid, gt)
        # pallas=False: the Pallas pooling kernel has no VJP; training needs
        # gradients to flow through the pooled features into the backbone
        pooled = multilevel_roi_align(
            [x.astype(jnp.float32) for x in f_img[:4]], prop_boxes,
            cfg.box_pool, FPN_STRIDES[:4], pallas=False)
        cls_logits, box_deltas = model.apply(
            params, pooled.astype(cfg.dtype), method=_apply_box_head)
        roi = roi_box_losses(cls_logits, box_deltas[:, :4], prop_boxes,
                             fg, bg, best_gt, gt)
        # mask head only on a static fg budget (d2 pools only sampled fg):
        # pooling + GT-mask gathers for all ~1k proposals would cost ~8x the
        # memory for rows whose loss weight is zero
        m = min(MASK_FG_BUDGET, prop_boxes.shape[0])
        _, sel = jax.lax.top_k(jnp.where(fg, best_iou, -1.0), m)
        mask_pooled = multilevel_roi_align(
            [x.astype(jnp.float32) for x in f_img[:4]], prop_boxes[sel],
            cfg.mask_pool, FPN_STRIDES[:4], pallas=False)
        mask_logits = model.apply(
            params, mask_pooled.astype(cfg.dtype), method=_apply_mask_head
        )[..., 0]
        roi["mask"] = roi_mask_loss(mask_logits, prop_boxes[sel], fg[sel],
                                    best_gt[sel], gt)
        return {**rpn, **roi}

    losses = jax.vmap(per_image)(feats, logits, deltas,
                                 gt_boxes, gt_masks, gt_valid)
    mean_losses = {k: v.mean() for k, v in losses.items()}
    total = sum(mean_losses.values())
    if return_state:
        return total, (mean_losses, mut)
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
