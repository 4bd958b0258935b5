"""The full Flax Mask R-CNN: one static XLA program per tile batch.

TPU-native counterpart of the reference's detectron2 model + DefaultPredictor
(reference ``config.py:25-66``, ``prediction.py:18-195``): input is an
already-normalized NHWC batch, output is a fixed-budget set of detections with
28x28 soft masks per image.  The entire forward — backbone, FPN, RPN,
proposal NMS, ROIAlign, heads, detection NMS, mask head — traces once and
compiles to a single program; there is no per-image Python.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from treedetection_tpu.models.anchors import pyramid_anchors_jnp
from treedetection_tpu.models.resnet import ResNetFPN
from treedetection_tpu.models.rpn import RPNHead, generate_proposals
from treedetection_tpu.models.roi_heads import (
    BoxHead, Detections, MaskHead, box_inference)
from treedetection_tpu.ops.roi_align import (
    multilevel_roi_align_batched)

FPN_STRIDES = (4, 8, 16, 32, 64)


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    depth: int = 101
    num_classes: int = 1            # reference config.py:35,59
    input_size: int = 1024
    score_threshold: float = 0.3    # reference config.py:60
    nms_threshold: float = 0.5      # reference config.py:61
    rpn_pre_nms_topk: int = 1000
    rpn_post_nms_topk: int = 1000
    rpn_nms_threshold: float = 0.7
    max_detections: int = 100
    mask_pool: int = 14
    box_pool: int = 7
    # detectron2 DefaultAnchorGenerator defaults; one size per FPN level
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    bf16: bool = True
    remat: bool = False  # rematerialize backbone blocks (training memory)
    # lax.scan over each stage's identical bottlenecks (see resnet.ResNet):
    # ~2.5x faster compiles, ~4x smaller executables, identical math
    scan_blocks: bool = True
    # TPU-optimized approximate top-k (jax.lax.approx_max_k) for RPN levels
    # with more anchors than this; P2 at 1024^2 has 196k anchors where exact
    # top-k sorts poorly on TPU.  0 disables (exact everywhere — the oracle
    # parity mode).  recall_target 0.99: only near-duplicate low-scoring
    # anchors ever differ, below NMS granularity.
    rpn_approx_topk_from: int = 0
    # backbone normalization: "frozen" (serving + fine-tuning converted
    # checkpoints — detectron2 FrozenBN affine) or "batch" (from-scratch
    # TRAINING ONLY: real batch statistics; fold to a frozen checkpoint with
    # models.convert.fold_batch_stats before serving)
    norm: str = "frozen"
    # serving-only W-folded res2 (see resnet.fold_kernel_w): identical math
    # + param tree, ~2x faster res2 on the MXU.  Ignored unless
    # norm == "frozen".
    fold_w: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.bf16 else jnp.float32


class ModelOutput(NamedTuple):
    boxes: jnp.ndarray      # (B, D, 4) in input-pixel coords
    scores: jnp.ndarray     # (B, D)
    classes: jnp.ndarray    # (B, D)
    valid: jnp.ndarray      # (B, D) bool
    masks: jnp.ndarray      # (B, D, 28, 28) uint8 sigmoid probability * 255
                            # (quantized on device: 4x less device->host fetch)
    roi_overflow: jnp.ndarray  # (B,) int32 — per-image count of VALID
                            # detections whose ROIAlign pooling (box pool,
                            # traced via the detection's source proposal, or
                            # mask pool) stayed TRUNCATED after every
                            # in-program fixup; hosts pass it to
                            # ops.roi_align.report_overflow_host so the
                            # degradation is never silent
    prop_overflow: Any = None  # (B,) int32 — truncated proposals in the top
                            # RPN-score quartile (a truncated proposal's
                            # depressed classifier score can silently
                            # SUPPRESS a detection, invisible to
                            # roi_overflow); reported separately so the two
                            # signals keep distinct host warnings


class MaskRCNN(nn.Module):
    """Batched inference Mask R-CNN.  Call with a normalized (B, S, S, 3)
    float batch; ``S == cfg.input_size``."""
    cfg: MaskRCNNConfig = MaskRCNNConfig()

    def setup(self):
        c = self.cfg
        self.backbone = ResNetFPN(depth=c.depth, dtype=c.dtype,
                                  remat=c.remat, scan_blocks=c.scan_blocks,
                                  norm=c.norm, fold_w=c.fold_w,
                                  name="backbone")
        self.rpn_head = RPNHead(num_anchors=len(c.anchor_ratios),
                                dtype=c.dtype, name="rpn_head")
        self.box_head = BoxHead(num_classes=c.num_classes, dtype=c.dtype,
                                name="box_head")
        self.mask_head = MaskHead(num_classes=c.num_classes, dtype=c.dtype,
                                  name="mask_head")
        # anchors generated on-device from iota at trace time — NOT
        # precomputed constants (which embedded ~130 MB of literals into
        # every executable; see anchors.grid_anchors_jnp)
        self._anchors = pyramid_anchors_jnp(
            c.input_size, FPN_STRIDES,
            sizes=c.anchor_sizes, ratios=c.anchor_ratios)

    def __call__(self, images: jnp.ndarray) -> ModelOutput:
        c = self.cfg
        B = images.shape[0]
        feats = self.backbone(images.astype(c.dtype))       # [P2..P6] NHWC
        logits, deltas = self.rpn_head(feats)

        # proposal selection stays per-image (top-k/NMS are tiny), but the
        # ROI pooling + heads run WHOLE-BATCH: each vmapped pallas_call paid
        # its ~2 ms prologue per image; one batched launch pays it once
        # (measured 15.9 -> ~10 ms box pool, 15.3 -> ~4 ms mask pool at B=8).
        def per_image_props(lg_img, dl_img):
            return generate_proposals(
                lg_img, dl_img, self._anchors, c.input_size,
                c.rpn_pre_nms_topk, c.rpn_post_nms_topk, c.rpn_nms_threshold,
                approx_topk_from=c.rpn_approx_topk_from)

        props = jax.vmap(per_image_props)(logits, deltas)   # (B, K, ...)
        K = props.boxes.shape[1]

        # ROIAlign gathers run in the compute dtype (bf16 on TPU): halves
        # the gather traffic; the interpolation error is far below the
        # mask threshold granularity.
        feats4 = [f.astype(c.dtype) for f in feats[:4]]
        pooled, box_inexact = multilevel_roi_align_batched(
            feats4, props.boxes, c.box_pool, FPN_STRIDES[:4],
            return_inexact_mask=True)                       # (B, K, R, R, C)
        cls_logits, box_deltas = self.box_head(
            pooled.reshape((B * K,) + pooled.shape[2:]).astype(c.dtype))
        cls_logits = cls_logits.reshape(B, K, -1)
        box_deltas = box_deltas.reshape(B, K, -1)

        det = jax.vmap(
            lambda cl, bd, pb, ps: box_inference(
                cl, bd, pb, ps, c.input_size, c.score_threshold,
                c.nms_threshold, c.max_detections)
        )(cls_logits, box_deltas, props.boxes, props.scores)
        D = det.boxes.shape[1]

        mask_pooled, mask_inexact = multilevel_roi_align_batched(
            feats4, det.boxes, c.mask_pool, FPN_STRIDES[:4],
            return_inexact_mask=True)                       # (B, D, r, r, C)
        mask_logits = self.mask_head(
            mask_pooled.reshape((B * D,) + mask_pooled.shape[2:])
            .astype(c.dtype))
        probs = jax.nn.sigmoid(mask_logits[..., 0])         # (B*D, 28, 28)
        masks = jnp.round(probs * 255.0).astype(jnp.uint8)
        masks = masks.reshape((B, D) + masks.shape[1:])
        # degraded-output counter: a VALID detection whose box-pool features
        # (traced via det.src) or mask-pool features were truncated.  Junk
        # proposals that never survive scoring don't count — the score-aware
        # budgets deliberately spend exactness on the top scorers.  A
        # truncated proposal whose depressed classifier score SUPPRESSES the
        # detection would be invisible to that count, so SEPARATELY count
        # truncated proposals in the top RPN-score quartile (proposals are
        # score-descending) — budget exhaustion that silently eats
        # detections still warns, under its own accurate message.
        det_box_trunc = jnp.take_along_axis(box_inexact, det.src, axis=1)
        degraded = (det.valid & (det_box_trunc | mask_inexact)).sum(axis=1)
        top_prop_trunc = box_inexact[:, :max(K // 4, 1)].sum(axis=1)
        return ModelOutput(boxes=det.boxes, scores=det.scores,
                           classes=det.classes, valid=det.valid, masks=masks,
                           roi_overflow=degraded.astype(jnp.int32),
                           prop_overflow=top_prop_trunc.astype(jnp.int32))


def create_model(cfg: Optional[MaskRCNNConfig] = None,
                 rng: Optional[jax.Array] = None,
                 batch_size: int = 1) -> Tuple[MaskRCNN, Dict]:
    """Initialize model + params (random init; use ``models.convert`` to load
    detectron2 checkpoints)."""
    cfg = cfg or MaskRCNNConfig()
    model = MaskRCNN(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # Param shapes are independent of the spatial input size (convs + FCs over
    # pooled features), so initialize at a small resolution to keep init cheap
    # and reuse the params at the real one.  Init runs pinned to the host CPU:
    # tracing the full forward through a remote-compiled accelerator backend
    # costs minutes, and init only produces arrays.
    init_cfg = dataclasses.replace(cfg, input_size=128, bf16=False)
    init_model = MaskRCNN(init_cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        dummy = jnp.zeros((1, 128, 128, 3), dtype=jnp.float32)
        # backend="cpu" is deprecated but the ONLY pinning the axon backend
        # honors (jax.default_device alone still routes jit through the remote
        # compiler, costing minutes).
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            params = jax.jit(init_model.init, backend="cpu")(rng, dummy)
    return model, params
