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

from typing import Optional, Sequence, Tuple

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


def multilevel_roi_align_gather(fmaps: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                                resolution: int, strides: Sequence[int],
                                sampling_ratio: int = 2) -> jnp.ndarray:
    """Gather-based multilevel ROIAlign (reference implementation).

    ``fmaps``: P2..P5 feature maps, (H_l, W_l, C), H halving per level.
    Implementation: flatten every level to rows and concatenate into ONE
    (sum HW, C) buffer; each sample point turns into a flat row index
    ``base[level] + row * W_level + col``.  The four bilinear corners become
    four row-gathers from the flat buffer — no padded (L, H0, W0, C) stack
    (which costs 4x the feature memory and was the HBM hog at batch 8),
    and row-gathers with the channel dim contiguous are the layout XLA's TPU
    gather handles best.

    Kept as the oracle for :func:`multilevel_roi_align` (the patch-matmul
    fast path) and as the fallback for pool geometries it can't serve.
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


# --- patch-matmul multilevel ROIAlign (the TPU fast path) -------------------

# Static per-box patch span.  Level assignment bounds sqrt(area)/stride to
# < 28 for interior levels (and image/stride for the clamped ones), but the
# max SIDE grows with aspect ratio: side = sqrt(area * aspect).  48 covers
# aspect ratios up to ~2.9:1 at the top of a level's size band (and higher
# for smaller boxes); boxes that outspan the patch are detected per-box and
# re-pooled through the exact gather path within a static budget
# (FALLBACK_BUDGET) so no bin is ever silently truncated.
PATCH = 48

# Static number of out-of-span boxes re-pooled via the gather path per call.
# Elongated (aspect > ~2.9) boxes are rare for blob-like crowns; if more than
# this many overflow in one image, the excess keeps the truncated patch
# pooling (bounded error on the overhanging bins only).
FALLBACK_BUDGET = 16

# Three-class patch pooling (batched pooler only).  The 48x56 patch covers
# boxes spanning <= 47 cells on their level, but the kernel is HBM-bandwidth
# bound (~1.38 MB per box at C=256 bf16) and MOST boxes — tree crowns are
# 25-75 px at 0.2 m GSD, 6-19 cells on their assigned level — fit a much
# smaller window.  The batched pooler therefore pools
#
# 1. EVERY box with a small (rows, rows+8) patch (16 rows for the 7x7 box
#    pool ~= 7x less traffic, 32 for the 14x14 mask pool);
# 2. a per-image budget of ``ceil(LARGE_FRAC * N)`` non-fitting boxes again
#    through the full 48-patch kernel; and
# 3. a per-image budget of ``ceil(EXACT_FRAC * N)`` boxes through the exact
#    GATHER path, which serves ANY span — the elongated junk proposals the
#    RPN emits span up to ~250 cells on P2 (measured
#    tools/tpu_sweep_results.jsonl 'span'), far beyond any patch.  Boxes
#    that outspan the 48-patch get first claim on this budget; unserved
#    class-2 spillover fills the rest.
#
# Budgets are PER IMAGE (a busy image can't starve a later one) and
# score-aware by construction: proposals arrive score-descending and top_k
# breaks ties toward lower indices, so each budget covers the
# highest-scoring non-fitting boxes first — the ones that can become
# detections.  Compute cost is distribution-INDEPENDENT (static shapes);
# beyond-budget boxes keep truncated small-patch pooling, flagged per box in
# the returned inexact mask (never silent — the model counts truncated
# VALID DETECTIONS and truncated top-quartile proposals).
#
# DEFAULT: small class DISABLED (every box pools through the full 48-patch
# kernel, exact for any span <= PATCH-1; the gather tail serves the rest).
# The small-window mix was sized from one measured span distribution
# (tools/tpu_sweep_results.jsonl, phase 'span') and saved ~6% of pooling
# time (box 56.6 -> 59.8 ms, mask 39.2 -> 37.6 ms at production geometry,
# phase 'roi3') — but a retrained checkpoint shifted the distribution and
# re-introduced hundreds of truncated poolings per batch.  Exactness must
# not depend on the proposal-span distribution; the small classes remain
# available as measured opt-ins via env.
# Env overrides: TD_ROI_SMALL (rows; nonzero enables the small class),
# TD_ROI_LARGE_FRAC (overlay budget when the small class is on),
# TD_ROI_EXACT_FRAC (0 disables the gather tail).
SMALL_PATCH_BOX = 0      # resolution <= 8 (7x7 box pool)
SMALL_PATCH_MASK = 0     # resolution > 8 (14x14 mask pool)
LARGE_FRAC_BOX = 0.50
LARGE_FRAC_MASK = 0.25
# Exact-tail budgets sized from the REAL checkpoint's span distribution
# (tools/tpu_sweep_results.jsonl 'span' 10:32, pixel_std-normalized):
# proposal spans p50 20.9 / p90 32.0 / max 53.8 — under 1% outspan the
# 48-patch, so 5% per image is a generous cover (the tail costs ~13 us/box
# through the XLA gather; 15% burned ~16 ms/batch on boxes that never
# needed it).  Overflow beyond the budget warns via roi_overflow.
EXACT_FRAC_BOX = 0.05
EXACT_FRAC_MASK = 0.08


def _class_params(n_per_image: int, resolution: int) -> Tuple[int, int, int]:
    """(small_patch, large_budget, exact_budget) for a batched pooling call
    with ``n_per_image`` boxes per image; budgets are per image."""
    import os as _os
    box = resolution <= 8
    small = int(_os.environ.get(
        "TD_ROI_SMALL", str(SMALL_PATCH_BOX if box else SMALL_PATCH_MASK)))
    if small >= PATCH:
        small = 0
    lfrac = float(_os.environ.get(
        "TD_ROI_LARGE_FRAC", str(LARGE_FRAC_BOX if box else LARGE_FRAC_MASK)))
    efrac = float(_os.environ.get(
        "TD_ROI_EXACT_FRAC", str(EXACT_FRAC_BOX if box else EXACT_FRAC_MASK)))

    def budget(frac):
        return 0 if frac <= 0 else min(n_per_image, int(np.ceil(
            n_per_image * frac)))

    m_large = budget(lfrac) if small > 0 else 0  # small=0 => all boxes large
    return max(small, 0), m_large, budget(efrac)


def _hat_matrix(samples: jnp.ndarray, size: int) -> jnp.ndarray:
    """(..., S) fractional sample coords -> (..., S, size) bilinear weights.

    The bilinear interpolation of F at coordinate s equals
    ``sum_k relu(1 - |s - k|) * F[k]`` — the "hat" kernel — which also
    reproduces ROIAlign's zero padding: samples beyond the array edge pick up
    weight only from existing rows (or none), exactly like interpolating
    against zero-valued out-of-range pixels.
    """
    rows = jnp.arange(size, dtype=samples.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(samples[..., None] - rows))


import logging

_logger = logging.getLogger("treedetection_tpu")

# Host-visible tally of truncated poolings — a silent-degradation counter.
# The jitted pooler returns the per-call count of boxes whose pooling stayed
# TRUNCATED after every in-program fixup (large-patch overlay + gather
# fallback) — ``return_overflow=True``, surfaced as
# ``ModelOutput.roi_overflow``.  Hosts feed fetched counts to
# :func:`report_overflow_host`, which warns and bumps this tally.
OVERFLOW_STATS = {"events": 0, "boxes_beyond_budget": 0}


def report_overflow_host(n_over: int, context: str = "",
                         budget: int = 0) -> None:
    """HOST-side check of a fetched truncation count (``ModelOutput.
    roi_overflow``): warn + tally when any box's pooling stayed truncated.

    The in-program count already accounts for every fixup budget (the
    large-patch overlay's ``LARGE_FRAC`` selection and the gather fallback's
    ``FALLBACK_BUDGET``), so any positive count means real degradation —
    ``budget`` is 0 by default and exists only for callers that tolerate a
    known number of truncations.

    Deliberately not an in-program ``jax.debug.callback``: host callbacks make
    the XLA executable unserializable, which would silently disable the
    persistent compilation cache for the whole model program.
    """
    n_over = int(n_over)
    if n_over <= budget:
        return
    OVERFLOW_STATS["events"] += 1
    OVERFLOW_STATS["boxes_beyond_budget"] += n_over - budget
    _logger.warning(
        f"ROIAlign patch overflow{context}: {n_over - budget} boxes exceeded "
        f"every exact re-pooling budget and keep truncated pooling (bounded "
        f"error on the overhanging bins; raise TD_ROI_LARGE_FRAC or set "
        f"TD_ROI_SMALL=0 to eliminate)")


def _patch_pool_prep(flat_boxes: jnp.ndarray, hs, ws,
                     strides: Sequence[int], resolution: int,
                     sampling_ratio: int, L: int):
    """Shared per-box patch-pooling geometry for the single-image and
    whole-batch poolers (identical math by construction): FPN level
    assignment, clamped patch origins, and patch-relative sample coords with
    ROIAlign edge semantics (samples strictly outside (-1, H) masked, border
    half-open bands clamped to the edge pixel).

    -> (levels, oy, ox, sy, sx, valid_y, valid_x)
    """
    levels = assign_fpn_levels(flat_boxes, min_level=2, max_level=2 + L - 1)
    scale = (1.0 / jnp.asarray(strides, dtype=flat_boxes.dtype))[levels]
    h_l = jnp.asarray(hs)[levels]
    w_l = jnp.asarray(ws)[levels]

    sboxes = flat_boxes * scale[:, None]
    x0 = sboxes[:, 0] - 0.5
    y0 = sboxes[:, 1] - 0.5
    bin_w = (sboxes[:, 2] - sboxes[:, 0]) / resolution
    bin_h = (sboxes[:, 3] - sboxes[:, 1]) / resolution
    # patch origin: clamp into the valid (padded) slice range
    oy = jnp.clip(jnp.floor(y0).astype(jnp.int32), 0, jnp.maximum(h_l - 1, 0))
    ox = jnp.clip(jnp.floor(x0).astype(jnp.int32), 0, jnp.maximum(w_l - 1, 0))

    # sample coords relative to the patch origin, (N, R*S)
    s = (jnp.arange(sampling_ratio, dtype=flat_boxes.dtype) + 0.5) \
        / sampling_ratio
    offs = (jnp.arange(resolution, dtype=flat_boxes.dtype)[:, None]
            + s[None, :]).reshape(-1)                      # (R*S,)
    sy_abs = y0[:, None] + offs[None, :] * bin_h[:, None]
    sx_abs = x0[:, None] + offs[None, :] * bin_w[:, None]
    hf = h_l.astype(flat_boxes.dtype)[:, None]
    wf = w_l.astype(flat_boxes.dtype)[:, None]
    valid_y = (sy_abs > -1.0) & (sy_abs < hf)
    valid_x = (sx_abs > -1.0) & (sx_abs < wf)
    sy = jnp.clip(sy_abs, 0.0, hf - 1.0) - oy.astype(flat_boxes.dtype)[:, None]
    sx = jnp.clip(sx_abs, 0.0, wf - 1.0) - ox.astype(flat_boxes.dtype)[:, None]
    return levels, oy, ox, sy, sx, valid_y, valid_x


def _fold_hats(sy: jnp.ndarray, sx: jnp.ndarray, valid_y: jnp.ndarray,
               valid_x: jnp.ndarray, resolution: int, sampling_ratio: int,
               width_x: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold the S-sample bin average into (N, R, PATCH) / (N, R, width_x)
    hat matrices."""
    n = sy.shape[0]
    ay_f = (_hat_matrix(sy, PATCH) * valid_y[..., None]).reshape(
        n, resolution, sampling_ratio, PATCH).mean(axis=2)
    ax_f = (_hat_matrix(sx, width_x) * valid_x[..., None]).reshape(
        n, resolution, sampling_ratio, width_x).mean(axis=2)
    return ay_f, ax_f


def _launch_patch_kernel(kpadded, meta: jnp.ndarray, ay_f: jnp.ndarray,
                         ax_f: jnp.ndarray, resolution: int,
                         force_interpret: bool) -> jnp.ndarray:
    """Pad to a chunk multiple and launch the Pallas patch-DMA kernel
    (chunk size / DMA pipeline depth env-tunable).

    The per-box patch geometry comes from the hat-matrix widths: ``ay_f``
    (N, R, patch) rows and ``ax_f`` (N, R, patch + 8) columns — callers pick
    the patch CLASS (small/large) by slicing the hat matrices.
    """
    from treedetection_tpu.ops.pallas import roi_align_kernel as _rk
    import os as _os
    n = meta.shape[0]
    patch = ay_f.shape[-1]
    assert ax_f.shape[-1] == patch + 8, (ay_f.shape, ax_f.shape)
    chunk_k = 128 if resolution <= 8 else 32
    if _os.environ.get("TD_ROI_CHUNK"):
        chunk_k = int(_os.environ["TD_ROI_CHUNK"])
    # DMA pipeline depth: the kernel is patch-latency bound; 4 in-flight
    # copies (~5.5 MB VMEM incl. out block) hide most of it.
    slots_k = int(_os.environ.get("TD_ROI_SLOTS", "4"))
    pad_n = (-n) % chunk_k
    ay_p, ax_p = ay_f, ax_f
    if pad_n:
        meta = jnp.pad(meta, ((0, pad_n), (0, 0)))
        ay_p = jnp.pad(ay_f, ((0, pad_n), (0, 0), (0, 0)))
        ax_p = jnp.pad(ax_f, ((0, pad_n), (0, 0), (0, 0)))
    return _rk.roi_pool_patches(
        kpadded, meta, ay_p.astype(jnp.float32), ax_p.astype(jnp.float32),
        resolution, patch, chunk_k, interpret=force_interpret,
        slots=slots_k)[:n]


def multilevel_roi_align(fmaps: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         resolution: int, strides: Sequence[int],
                         sampling_ratio: int = 2,
                         chunk: int = 128,
                         pallas: Optional[bool] = None,
                         force_interpret: bool = False,
                         return_overflow: bool = False):
    """Pool each box from its assigned FPN level -> (N, R, R, C).

    TPU fast path: instead of 4 corner row-gathers per sample point
    (R^2 * S^2 * 4 scattered gathers per box), each box dynamic-slices one
    contiguous (PATCH, PATCH, C) patch from its level and reduces it with two
    small "hat"-matrix matmuls on the MXU::

        out[i, j, c] = A_y[i, :] @ patch[:, :, c] @ A_x[j, :]^T

    where ``A_y`` folds the bilinear weights AND the 2x2-sample bin average
    into a (R, PATCH) matrix.  Exact same math as ROIAlign(aligned=True)
    with a fixed sampling grid — pinned against the gather implementation by
    tests.  Falls back to the gather path when a box could outspan the patch
    (only possible for non-FPN pool geometries).
    """
    L = len(fmaps)
    C = fmaps[0].shape[-1]
    dtype = fmaps[0].dtype
    n = boxes.shape[0]

    # patch-span guarantee: on its assigned level a box spans at most
    # canonical_size/stride * 2 = 28 px for interior levels; clamped levels
    # are bounded by image_size / stride of the extreme level.  If the
    # geometry violates PATCH - 2, use the gather path.
    img_span = max(f.shape[0] * s for f, s in zip(fmaps, strides))
    if img_span / strides[-1] > PATCH - 2:
        out = multilevel_roi_align_gather(fmaps, boxes, resolution, strides,
                                          sampling_ratio)
        # gather path is exact for every box — nothing can overflow
        return (out, jnp.zeros((), jnp.int32)) if return_overflow else out

    # flat buffer with per-level bottom/right zero padding of PATCH rows/cols
    padded = [jnp.pad(f, ((0, PATCH), (0, PATCH), (0, 0))) for f in fmaps]
    flat = jnp.concatenate([p.reshape(-1, C) for p in padded], axis=0)
    hs = np.asarray([f.shape[0] for f in fmaps])
    ws = np.asarray([f.shape[1] for f in fmaps])
    wps = ws + PATCH
    sizes = (hs + PATCH) * wps
    bases = np.concatenate([[0], np.cumsum(sizes)[:-1]])

    levels, oy, ox, sy, sx, valid_y, valid_x = _patch_pool_prep(
        boxes, hs, ws, strides, resolution, sampling_ratio, L)
    wp_l = jnp.asarray(wps)[levels]
    base_l = jnp.asarray(bases)[levels]

    # out-of-span detection: a sample at patch-relative coord > PATCH-1 needs
    # a row the patch doesn't hold (the hat weight would truncate it)
    overflow = (jnp.max(sy, axis=1) > PATCH - 1) | \
               (jnp.max(sx, axis=1) > PATCH - 1)
    ay_f, ax_f = _fold_hats(sy, sx, valid_y, valid_x, resolution,
                            sampling_ratio, PATCH)
    ay = ay_f.astype(dtype)
    ax = ax_f.astype(dtype)

    # Pallas fast path: per-box patch DMA + MXU contractions (the vmapped
    # dynamic_slice lowering below is the top cost of the whole forward).
    # HBM DMA column origins must be 8-aligned, so the column origin snaps
    # down to a multiple of 8 and the column window widens to PATCH+8.
    # NOTE: the kernel defines no VJP — training (``train.losses``) passes
    # ``pallas=False`` to keep the differentiable XLA path.
    from treedetection_tpu.ops.pallas import roi_align_kernel as _rk
    import os as _os
    if pallas is None:
        pallas = _rk.available() and \
            _os.environ.get("TD_PALLAS_ROIALIGN", "1") != "0"
    if pallas and (_rk.available() or force_interpret):
        cpatch = PATCH + 8
        ox_al = (ox // 8) * 8
        sx_al = sx + (ox - ox_al).astype(boxes.dtype)[:, None]
        _, ax_k = _fold_hats(sy, sx_al, valid_y, valid_x, resolution,
                             sampling_ratio, cpatch)
        overflow_k = (jnp.max(sy, axis=1) > PATCH - 1) | \
                     (jnp.max(sx_al, axis=1) > cpatch - 1)
        kpadded = tuple(jnp.pad(f, ((0, PATCH), (0, cpatch), (0, 0)))
                        for f in fmaps)
        meta = jnp.stack([levels, oy, ox_al], axis=1).astype(jnp.int32)
        out = _launch_patch_kernel(kpadded, meta, ay_f, ax_k, resolution,
                                   force_interpret)
        inexact = overflow_k
        m = min(FALLBACK_BUDGET, n)
        if m > 0:
            flag, idx = jax.lax.top_k(overflow_k.astype(jnp.float32), m)
            fb = multilevel_roi_align_gather(fmaps, boxes[idx], resolution,
                                             strides, sampling_ratio)
            take = (flag > 0)[:, None, None, None]
            out = out.at[idx].set(jnp.where(take, fb.astype(out.dtype),
                                            out[idx]))
            sel = jnp.zeros((n,), bool).at[idx].set(flag > 0)
            inexact = overflow_k & ~sel
        if return_overflow:
            return out, jnp.sum(inexact.astype(jnp.int32))
        return out

    starts = (base_l[:, None] + (oy[:, None]
              + jnp.arange(PATCH)[None, :]) * wp_l[:, None]
              + ox[:, None])                                # (N, PATCH)

    def pool_chunk(args):
        st, a_y, a_x = args                                 # (K,PATCH),(K,R,PATCH)x2
        def slice_rows(s0):
            return jax.lax.dynamic_slice(flat, (s0, 0), (PATCH, C))
        patches = jax.vmap(jax.vmap(slice_rows))(st)        # (K, PATCH, PATCH, C)
        # out[k, i, j, c] = sum_{y, x} a_y[k,i,y] a_x[k,j,x] patch[k,y,x,c]
        t = jnp.einsum("kiy,kyxc->kixc", a_y, patches,
                       preferred_element_type=dtype)
        return jnp.einsum("kjx,kixc->kijc", a_x, t,
                          preferred_element_type=dtype)

    if n <= chunk:
        out = pool_chunk((starts, ay, ax))
    else:
        pad_n = (-n) % chunk
        st = jnp.pad(starts, ((0, pad_n), (0, 0)))
        a_y = jnp.pad(ay, ((0, pad_n), (0, 0), (0, 0)))
        a_x = jnp.pad(ax, ((0, pad_n), (0, 0), (0, 0)))
        k = (n + pad_n) // chunk
        out = jax.lax.map(pool_chunk,
                          (st.reshape(k, chunk, PATCH),
                           a_y.reshape(k, chunk, resolution, PATCH),
                           a_x.reshape(k, chunk, resolution, PATCH)))
        out = out.reshape(k * chunk, resolution, resolution, C)[:n]

    # exact-pool fixup for out-of-span boxes: re-pool up to FALLBACK_BUDGET of
    # them through the gather path (static shapes; top_k picks the overflow
    # boxes) and scatter the results back.
    inexact = overflow
    m = min(FALLBACK_BUDGET, n)
    if m > 0:
        flag, idx = jax.lax.top_k(overflow.astype(jnp.float32), m)
        fb = multilevel_roi_align_gather(fmaps, boxes[idx], resolution,
                                         strides, sampling_ratio)
        take = (flag > 0)[:, None, None, None]
        out = out.at[idx].set(jnp.where(take, fb.astype(out.dtype), out[idx]))
        sel = jnp.zeros((n,), bool).at[idx].set(flag > 0)
        inexact = overflow & ~sel
    if return_overflow:
        return out, jnp.sum(inexact.astype(jnp.int32))
    return out


def _launch_resident_kernel(kpadded, levels: jnp.ndarray, oy: jnp.ndarray,
                            ox_al: jnp.ndarray, sy: jnp.ndarray,
                            sx_al: jnp.ndarray, valid_y: jnp.ndarray,
                            valid_x: jnp.ndarray, resolution: int,
                            sampling_ratio: int, n_images: int,
                            force_interpret: bool) -> Optional[jnp.ndarray]:
    """Launch the VMEM-resident pooler (``roi_pool_resident``): per-image
    level sections copied HBM->VMEM once, boxes sliced from the resident
    sections — removes the per-box patch-DMA HBM floor (~1.4 MB/box).

    Takes the raw per-box geometry (image-relative origins + patch-relative
    sample coords, image-grouped) because the resident sections hold only
    the UNPADDED level: origins are clamped to [0, sec-window] and the
    sample coords shifted by the clamp before folding the hat matrices — a
    clamped window always contains the full in-image span of a fitting box
    (origin + span <= dim - 1), so the math is unchanged.

    Returns None when no C-split fits the VMEM budget (TD_ROI_VMEM_MB,
    default 64 = the scoped-vmem ceiling the backend's AOT compiler
    enforces regardless of vmem_limit_bytes; a 32 MB margin covers Mosaic's
    measured accounting overhead) — the caller falls back to the patch-DMA
    kernel.
    """
    from treedetection_tpu.ops.pallas import roi_align_kernel as _rk
    import os as _os
    n = levels.shape[0]
    n_per = n // n_images
    c = kpadded[0].shape[-1]
    cpatch = PATCH + 8
    itemsize = np.dtype(kpadded[0].dtype).itemsize
    hs = [f.shape[0] // n_images - PATCH for f in kpadded]
    ws = [f.shape[1] - cpatch for f in kpadded]
    budget = int(float(_os.environ.get("TD_ROI_VMEM_MB", "64")) * (1 << 20))
    c_split = None
    s = 1
    while c % s == 0:
        # Mosaic requires output-block minor dims divisible by 128 (or the
        # full dim), so C-splits below 128 channels are TPU-invalid; the
        # interpret path (CI) has no such constraint.
        blk_ok = force_interpret or s == 1 or (c // s) % 128 == 0
        if blk_ok and _rk.resident_vmem_bytes(hs, ws, c // s, PATCH,
                                              itemsize) \
                + (32 << 20) <= budget:
            c_split = s
            break
        s *= 2
    if c_split is None:
        return None

    # clamp window origins into the unpadded sections; shift the
    # patch-relative sample coords to match, then fold the hat matrices
    sec_hs = [max(h, PATCH) for h in hs]
    sec_ws = [max(w, cpatch) for w in ws]
    max_r0 = jnp.asarray([h - PATCH for h in sec_hs], jnp.int32)[levels]
    max_c0 = jnp.asarray([w - cpatch for w in sec_ws], jnp.int32)[levels]
    r0 = jnp.minimum(oy, max_r0)
    c0 = jnp.minimum(ox_al, max_c0)
    sy2 = sy + (oy - r0).astype(sy.dtype)[:, None]
    sx2 = sx_al + (ox_al - c0).astype(sx_al.dtype)[:, None]
    ay_f, ax_f = _fold_hats(sy2, sx2, valid_y, valid_x, resolution,
                            sampling_ratio, cpatch)
    meta = jnp.stack([levels, r0, c0], axis=1).astype(jnp.int32)
    chunk_k = 128 if resolution <= 8 else 32
    if _os.environ.get("TD_ROI_CHUNK"):
        chunk_k = int(_os.environ["TD_ROI_CHUNK"])
    chunk_k = min(chunk_k, n_per)
    pad_per = (-n_per) % chunk_k
    if pad_per:
        def pad_img(a):
            shp = (n_images, n_per) + a.shape[1:]
            widths = [(0, 0), (0, pad_per)] + [(0, 0)] * (a.ndim - 1)
            padded = jnp.pad(a.reshape(shp), widths)
            return padded.reshape((n_images * (n_per + pad_per),)
                                  + a.shape[1:])
        meta, ay_f, ax_f = pad_img(meta), pad_img(ay_f), pad_img(ax_f)
    out = _rk.roi_pool_resident(
        kpadded, meta, ay_f.astype(jnp.float32), ax_f.astype(jnp.float32),
        resolution, PATCH, chunk_k, n_images, c_split,
        interpret=force_interpret)
    if pad_per:
        out = out.reshape((n_images, n_per + pad_per) + out.shape[1:])
        out = out[:, :n_per].reshape((n,) + out.shape[2:])
    return out


def _launch_patch_kernel_flat(kcat: jnp.ndarray, meta: jnp.ndarray,
                              ay_f: jnp.ndarray, ax_f: jnp.ndarray,
                              resolution: int,
                              force_interpret: bool) -> jnp.ndarray:
    """Flat-buffer variant of :func:`_launch_patch_kernel`: ``kcat`` is the
    single level-concatenated buffer and ``meta`` is (N, 2) int32
    [abs_row, col] — the level/image base is folded into the row, so the
    kernel's per-box DMA needs no level branching."""
    from treedetection_tpu.ops.pallas import roi_align_kernel as _rk
    import os as _os
    n = meta.shape[0]
    patch = ay_f.shape[-1]
    assert ax_f.shape[-1] == patch + 8, (ay_f.shape, ax_f.shape)
    chunk_k = 128 if resolution <= 8 else 32
    if _os.environ.get("TD_ROI_CHUNK"):
        chunk_k = int(_os.environ["TD_ROI_CHUNK"])
    slots_k = int(_os.environ.get("TD_ROI_SLOTS", "4"))
    pad_n = (-n) % chunk_k
    ay_p, ax_p = ay_f, ax_f
    if pad_n:
        meta = jnp.pad(meta, ((0, pad_n), (0, 0)))
        ay_p = jnp.pad(ay_f, ((0, pad_n), (0, 0), (0, 0)))
        ax_p = jnp.pad(ax_f, ((0, pad_n), (0, 0), (0, 0)))
    return _rk.roi_pool_patches_flat(
        kcat, meta[:, 0], meta[:, 1],
        ay_p.astype(jnp.float32), ax_p.astype(jnp.float32),
        resolution, patch, chunk_k, interpret=force_interpret,
        slots=slots_k)[:n]


def multilevel_roi_align_batched(fmaps: Sequence[jnp.ndarray],
                                 boxes: jnp.ndarray,
                                 resolution: int, strides: Sequence[int],
                                 sampling_ratio: int = 2,
                                 pallas: Optional[bool] = None,
                                 force_interpret: bool = False,
                                 return_overflow: bool = False,
                                 return_inexact_mask: bool = False):
    """Whole-batch multilevel ROIAlign: ``fmaps[l]`` (B, H_l, W_l, C),
    ``boxes`` (B, N, 4) -> (B, N, R, R, C).

    ONE Pallas kernel launch pools every image's boxes: each level's batch is
    row-concatenated into a single (B*(H_l+PATCH), W_l+cpatch, C) buffer and
    the patch origin row gets an ``img * (H_l+PATCH)`` base.  The per-call
    kernel overhead (~2 ms prologue + prep) that a vmap of per-image calls
    pays B times is paid once — measured 15.9 -> ~10 ms for 8x512 box pools
    and 15.3 -> ~4 ms for 8x100 mask pools on v5e.

    Identical math to :func:`multilevel_roi_align` (same hat matrices, same
    exact gather path), organized as a three-class scheme: every box pools
    through a small patch, a per-image score-aware top-k of non-fitting
    boxes re-pools through the full 48-patch kernel, and a second per-image
    budget re-pools ANY-span boxes (the elongated junk proposals) through
    the exact gather path (see the ``SMALL_PATCH_BOX`` comment).
    ``return_overflow`` appends per-image tallies of boxes whose pooling
    stayed truncated after every class (0 == every box exact);
    ``return_inexact_mask`` appends the underlying (B, N) bool mask instead
    (the model uses it to count truncated VALID DETECTIONS only).
    On CPU (no Pallas) falls back to a vmap of the exact gather path.
    """
    B, N = boxes.shape[0], boxes.shape[1]
    L = len(fmaps)
    C = fmaps[0].shape[-1]
    dtype = fmaps[0].dtype

    from treedetection_tpu.ops.pallas import roi_align_kernel as _rk
    import os as _os
    # TD_PALLAS_INTERPRET=1 runs the Pallas patch kernels in interpret mode
    # on non-TPU backends — lets the multichip dryrun exercise the REAL
    # three-class pooler (not the gather fallback) on a virtual CPU mesh
    force_interpret = force_interpret or \
        _os.environ.get("TD_PALLAS_INTERPRET") == "1"
    if pallas is None:
        pallas = (_rk.available() or force_interpret) and \
            _os.environ.get("TD_PALLAS_ROIALIGN", "1") != "0"
    img_span = max(f.shape[1] * s for f, s in zip(fmaps, strides))
    if not (pallas and (_rk.available() or force_interpret)) \
            or img_span / strides[-1] > PATCH - 2:
        def per_image(*args):
            f_img = list(args[:L])
            return multilevel_roi_align_gather(
                f_img, args[L], resolution, strides, sampling_ratio)
        out = jax.vmap(per_image)(*fmaps, boxes)
        if return_inexact_mask:
            return out, jnp.zeros((B, N), bool)
        if return_overflow:
            return out, jnp.zeros((B,), jnp.int32)
        return out

    flat_boxes = boxes.reshape(B * N, 4)
    n = B * N
    img = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)

    hs = np.asarray([f.shape[1] for f in fmaps])
    ws = np.asarray([f.shape[2] for f in fmaps])
    cpatch = PATCH + 8

    levels, oy, ox, sy, sx, valid_y, valid_x = _patch_pool_prep(
        flat_boxes, hs, ws, strides, resolution, sampling_ratio, L)

    ox_al = (ox // 8) * 8
    sx_al = sx + (ox - ox_al).astype(flat_boxes.dtype)[:, None]
    ay_f, ax_f = _fold_hats(sy, sx_al, valid_y, valid_x, resolution,
                            sampling_ratio, cpatch)
    span_y = jnp.max(sy, axis=1)
    span_x = jnp.max(sx_al, axis=1)
    overflow = (span_y > PATCH - 1) | (span_x > cpatch - 1)

    # row-concatenated per-level buffers: image b of level l starts at row
    # b * (H_l + PATCH); the PATCH bottom padding keeps every patch slice
    # inside its own image's section
    row_base = img * (jnp.asarray(hs + PATCH, dtype=jnp.int32)[levels])
    use_flat = _os.environ.get("TD_ROI_FLAT", "1") == "1"
    use_resident = _os.environ.get("TD_ROI_RESIDENT", "0") == "1"
    if use_flat and not use_resident:
        # ONE uniform-width buffer for every (level, image) section: the
        # level/image base folds into the row coordinate, so the Pallas
        # per-box DMA needs no level branching (the per-box loop is
        # scalar-control bound — 8 predicated copy constructions per box
        # were ~40% of it) and the exact-gather tail indexes the same
        # buffer without re-flattening.  Width-padding the upper levels to
        # W_max costs ~40% more HBM for the buffer build (~0.3 ms/batch).
        wmax = int(ws.max()) + cpatch
        kcat = jnp.concatenate([
            jnp.pad(f, ((0, 0), (0, PATCH), (0, wmax - int(f.shape[2])),
                        (0, 0)))
            .reshape(B * (int(f.shape[1]) + PATCH), wmax, C)
            for f in fmaps], axis=0)
        lvl_base = np.concatenate(
            [[0], np.cumsum((hs + PATCH) * B)[:-1]])       # section rows
        abs_row = jnp.asarray(lvl_base, jnp.int32)[levels] + row_base + oy
        meta = jnp.stack([abs_row, ox_al], axis=1).astype(jnp.int32)

        def launch(m, a1, a2):
            return _launch_patch_kernel_flat(kcat, m, a1, a2, resolution,
                                             force_interpret)

        def gather(boxes_g, levels_g, img_g):
            return _gather_rows_core(
                kcat.reshape(-1, C), lvl_base * wmax,
                np.full(L, wmax, dtype=np.int64), hs, ws, boxes_g, levels_g,
                img_g, resolution, strides, sampling_ratio)
    else:
        kpadded = tuple(
            jnp.pad(f, ((0, 0), (0, PATCH), (0, cpatch), (0, 0)))
            .reshape(B * (f.shape[1] + PATCH), f.shape[2] + cpatch, C)
            for f in fmaps)
        meta = jnp.stack([levels, row_base + oy, ox_al],
                         axis=1).astype(jnp.int32)

        def launch(m, a1, a2):
            return _launch_patch_kernel(kpadded, m, a1, a2, resolution,
                                        force_interpret)

        def gather(boxes_g, levels_g, img_g):
            return _gather_batched_rows(kpadded, hs, ws, boxes_g, levels_g,
                                        img_g, resolution, strides,
                                        sampling_ratio)

    # three-class pooling (see the _class_params comment): small patches for
    # everyone, a per-image 48-patch budget for non-fitting boxes, an exact
    # per-image gather budget for anything beyond that (any span).  Hat
    # weights beyond a FITTING box's span are exactly zero, so slicing the
    # hat matrices IS the small-patch pooling — identical math, 3.5-7x less
    # DMA traffic.
    small, m_large, m_exact = _class_params(N, resolution)
    need_exact = overflow.reshape(B, N)        # outspans even the 48-patch
    if small:
        fits_small = ~((span_y > small - 1) | (span_x > small + 8 - 1))
        need_large = ~fits_small.reshape(B, N) & ~need_exact
        out = launch(meta, ay_f[:, :, :small], ax_f[:, :, :small + 8])
    else:
        need_large = jnp.zeros((B, N), bool)
        out = None
        # Default OFF: measured SLOWER than the patch-DMA kernel at
        # production geometry (74.0 vs 60.8 ms box pool, 42.1 vs 38.1 mask —
        # tools/tpu_sweep_results.jsonl 'roi3' 10:18): per-box scalar-loop
        # overhead dominates both kernels, the patch DMA was already fully
        # hidden by its in-flight pipeline, and the c_split=2 grid doubles
        # the per-box loop.  Kept as an opt-in for future tuning.
        if use_resident:
            out = _launch_resident_kernel(kpadded, levels, oy, ox_al, sy,
                                          sx_al, valid_y, valid_x,
                                          resolution, sampling_ratio, B,
                                          force_interpret)
        if out is None:
            out = launch(meta, ay_f, ax_f)

    img_base = jnp.arange(B, dtype=jnp.int32)[:, None] * N
    sel_large = jnp.zeros((n,), bool)
    if small and m_large > 0:
        flag_l, idx_l = jax.lax.top_k(need_large.astype(jnp.float32),
                                      m_large)                  # (B, m_l)
        flat_l = (img_base + idx_l).reshape(-1)
        take_l = (flag_l > 0).reshape(-1)
        out_l = launch(meta[flat_l], ay_f[flat_l], ax_f[flat_l])
        out = out.at[flat_l].set(jnp.where(take_l[:, None, None, None],
                                           out_l.astype(out.dtype),
                                           out[flat_l]))
        sel_large = sel_large.at[flat_l].set(take_l)

    sel_exact = jnp.zeros((n,), bool)
    if m_exact > 0:
        # beyond-48 boxes first, then class-2 spillover the large budget
        # missed; ties break toward lower index == higher proposal score
        prio = (need_exact.astype(jnp.float32) * 2.0
                + (need_large & ~sel_large.reshape(B, N)).astype(jnp.float32))
        flag_e, idx_e = jax.lax.top_k(prio, m_exact)            # (B, m_e)
        flat_e = (img_base + idx_e).reshape(-1)
        take_e = (flag_e > 0).reshape(-1)
        fb = gather(flat_boxes[flat_e], levels[flat_e], img[flat_e])
        out = out.at[flat_e].set(jnp.where(take_e[:, None, None, None],
                                           fb.astype(out.dtype),
                                           out[flat_e]))
        sel_exact = sel_exact.at[flat_e].set(take_e)

    inexact = ((need_large | need_exact).reshape(-1)
               & ~sel_large & ~sel_exact)

    out = out.reshape(B, N, resolution, resolution, C)
    if return_inexact_mask:
        return out, inexact.reshape(B, N)
    if return_overflow:
        per_img = jnp.sum(inexact.reshape(B, N).astype(jnp.int32), axis=1)
        return out, per_img
    return out


def _gather_batched_rows(kpadded: Sequence[jnp.ndarray], hs, ws,
                         boxes: jnp.ndarray, levels: jnp.ndarray,
                         img: jnp.ndarray, resolution: int,
                         strides: Sequence[int], sampling_ratio: int
                         ) -> jnp.ndarray:
    """Exact gather ROIAlign for M (box, level, image) triples against the
    row-concatenated padded level buffers (the batched fallback path).

    Same math as :func:`multilevel_roi_align_gather`; the flat row index
    gains the per-image row base ``img * (H_l + PATCH)`` and per-level
    padded width.
    """
    C = kpadded[0].shape[-1]
    cpatch = PATCH + 8
    flat = jnp.concatenate([k.reshape(-1, C) for k in kpadded], axis=0)
    wps = np.asarray(ws) + cpatch
    sizes = np.asarray([k.shape[0] * k.shape[1] for k in kpadded])
    bases = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    return _gather_rows_core(flat, bases, wps, hs, ws, boxes, levels, img,
                             resolution, strides, sampling_ratio)


def _gather_rows_core(flat: jnp.ndarray, bases, wps, hs, ws,
                      boxes: jnp.ndarray, levels: jnp.ndarray,
                      img: jnp.ndarray, resolution: int,
                      strides: Sequence[int], sampling_ratio: int
                      ) -> jnp.ndarray:
    """Exact gather ROIAlign against a pre-flattened (rows*cols, C) buffer.

    ``bases``: (L,) flat-element base of level l's section; ``wps``: (L,)
    row pitch in elements.  Serves both the per-level-width layout
    (:func:`_gather_batched_rows`) and the uniform-width level-concat
    layout (``TD_ROI_FLAT``), whose base/pitch arrays differ only here.
    """
    C = flat.shape[-1]
    hps = np.asarray(hs) + PATCH

    scales = 1.0 / jnp.asarray(strides, dtype=boxes.dtype)
    ys, xs = _sample_grid(boxes, scales[levels], resolution, sampling_ratio)
    h = jnp.asarray(hs)[levels][:, None, None, None, None]
    w = jnp.asarray(ws)[levels][:, None, None, None, None]
    hp = jnp.asarray(hps)[levels][:, None, None, None, None]
    wp = jnp.asarray(wps)[levels][:, None, None, None, None]
    base = jnp.asarray(bases)[levels][:, None, None, None, None] \
        + (img[:, None, None, None, None] * hp) * wp
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
        idx = (base + yy * wp + xx).reshape(-1)
        return flat[idx].reshape((*yy.shape, C))

    out = (rows(y0, x0) * (1 - ly) * (1 - lx)
           + rows(y0, x1) * (1 - ly) * lx
           + rows(y1, x0) * ly * (1 - lx)
           + rows(y1, x1) * ly * lx)
    out = jnp.where(valid[..., None], out, 0.0)
    return out.mean(axis=(3, 4))
