"""Pallas TPU ROIAlign: per-box patch DMA + MXU hat-matrix contractions.

The XLA patch-matmul pooler (``ops.roi_align.multilevel_roi_align``) spends
its time in the vmapped ``dynamic_slice`` lowering (~86 ms of a 228 ms
batch-8 forward, the single largest stage).  This kernel streams each box's
(PATCH, PATCH, C) patch HBM->VMEM with an explicit double-buffered async
copy and reduces it with two small matmuls on the MXU:

    out[i, j, c] = sum_{y, x} A_y[i, y] * A_x[j, x] * patch[y, x, c]

The hat matrices (bilinear weights x sample-average folding, identical math
to the XLA path) are computed outside in jnp; the kernel only moves patches
and contracts.  Boxes whose column span exceeds PATCH are fixed up by the
caller's gather fallback exactly as in the XLA path.

Grid: one program per CHUNK of boxes; within a program a ``fori_loop``
double-buffers patch DMAs (slot k+1 in flight while slot k contracts).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def available() -> bool:
    """Pallas TPU path available on this backend?"""
    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("resolution", "patch", "chunk",
                                             "interpret", "slots"))
def roi_pool_patches(fmaps_padded: Tuple[jnp.ndarray, ...],
                     meta: jnp.ndarray, ay: jnp.ndarray, ax: jnp.ndarray,
                     resolution: int, patch: int,
                     chunk: int, interpret: bool = False,
                     slots: int = 2) -> jnp.ndarray:
    """Pool N boxes -> (N, R, R, C).

    ``fmaps_padded``: per-level (H_l+patch, W_l+cpatch, C) arrays
    (bottom/right zero padding), where ``cpatch = patch + 8``: HBM memrefs
    tile the second-to-last dim by 8, so the DMA column origin must be
    8-aligned — the caller aligns col0 down and widens the column window.
    ``meta``: (N, 3) int32 [level, row0, col0] patch origins (col0 % 8 == 0).
    ``ay``: (N, R, patch) / ``ax``: (N, R, cpatch) float32 hat matrices.

    ``meta`` is split into three 1-D scalar-prefetch operands internally: a
    2-D SMEM operand is lane-padded to (N, 128), which blows the 1 MB SMEM
    budget for whole-batch N (8 x 1008 boxes -> 4 MB); three (N,) vectors
    stay at 4 bytes per box.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = meta.shape[0]
    c = fmaps_padded[0].shape[-1]
    cpatch = patch + 8
    r = resolution
    dtype = fmaps_padded[0].dtype
    n_levels = len(fmaps_padded)
    grid = n // chunk
    assert n % chunk == 0, "caller pads N to a chunk multiple"

    def kernel(lvl_ref, row_ref, col_ref, w_y_ref, w_x_ref, *rest):
        frefs = rest[:n_levels]
        out_ref = rest[n_levels]
        patch_scratch = rest[n_levels + 1]
        sems = rest[n_levels + 2]
        pid = pl.program_id(0)

        def _copy(k, slot):
            i = pid * chunk + k
            lvl = lvl_ref[i]
            r0 = row_ref[i]
            c0 = pl.multiple_of(col_ref[i], 8)
            def mk(l):
                return pltpu.make_async_copy(
                    frefs[l].at[pl.ds(r0, patch), pl.ds(c0, cpatch), :],
                    patch_scratch.at[slot],
                    sems.at[slot],
                )
            return lvl, mk

        def dma(k, slot):
            lvl, mk = _copy(k, slot)
            for l in range(n_levels):
                @pl.when(lvl == l)
                def _(l=l):
                    mk(l).start()

        def wait(k, slot):
            lvl, mk = _copy(k, slot)
            for l in range(n_levels):
                @pl.when(lvl == l)
                def _(l=l):
                    mk(l).wait()

        # S-deep DMA pipeline: slots-1 copies in flight hide the per-patch
        # HBM latency (the kernel is latency-, not bandwidth-, bound: each
        # patch is ~1 MB but issued one box at a time).  With slots=1 the
        # prologue issues NOTHING: the body's ahead = k+slots-1 = k already
        # issues box k's copy right before waiting on it (serial pipeline);
        # a prologue copy would double-issue box 0 and leak a semaphore
        # increment, letting later waits return before their copy lands.
        for w in range(min(slots - 1, chunk)):
            dma(w, w % slots)

        def body(k, _):
            cur = jax.lax.rem(k, slots)
            ahead = k + slots - 1

            @pl.when(ahead < chunk)
            def _():
                dma(ahead, jax.lax.rem(ahead, slots))

            wait(k, cur)
            p = patch_scratch[cur]                       # (patch, cpatch, C)
            # Contract in the FEATURE dtype (bf16 in production): the MXU
            # takes bf16 inputs natively with f32 accumulation, and casting
            # the whole ~1.4 MB patch to f32 on the VPU (the old code) cost
            # more than the matmuls themselves.  f32 features (the interpret
            # -mode parity tests) keep exact f32 math; bf16 weights add
            # ~2^-9 relative rounding on top of the bf16 features, bounded
            # end-to-end by the full-model bf16 drift test.
            a_y = w_y_ref[k].astype(dtype)               # (R, patch)
            a_x = w_x_ref[k].astype(dtype)               # (R, cpatch)
            # rows: (R, patch) @ (patch, cpatch*C) -> (R, cpatch*C)
            t = jnp.dot(a_y, p.reshape(patch, cpatch * c),
                        preferred_element_type=jnp.float32)
            t = t.reshape(r, cpatch, c).astype(dtype)
            # cols: contract patch -> (R_x, R_y, C), transpose bins on write
            res = jax.lax.dot_general(
                a_x, t, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (R_j, R_i, C)
            out_ref[k] = jnp.transpose(res, (1, 0, 2)).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, r, patch), lambda i, l, rr, cc: (i, 0, 0)),
            pl.BlockSpec((chunk, r, cpatch), lambda i, l, rr, cc: (i, 0, 0)),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
        out_specs=pl.BlockSpec((chunk, r, r, c),
                               lambda i, l, rr, cc: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((slots, patch, cpatch, c), dtype),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, r, r, c), dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # CPU validation hook (mirrors iou_kernel's force_interpret): the TPU
        # interpreter emulates the DMA/semaphore semantics, so the patch
        # copies + hat-matrix math get CI coverage without a chip.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(meta[:, 0], meta[:, 1], meta[:, 2], ay, ax, *fmaps_padded)


@functools.partial(jax.jit, static_argnames=("resolution", "patch", "chunk",
                                             "interpret", "slots"))
def roi_pool_patches_flat(fcat: jnp.ndarray,
                          rows: jnp.ndarray, cols: jnp.ndarray,
                          ay: jnp.ndarray, ax: jnp.ndarray,
                          resolution: int, patch: int,
                          chunk: int, interpret: bool = False,
                          slots: int = 2) -> jnp.ndarray:
    """Pool N boxes -> (N, R, R, C) from ONE level-concatenated buffer.

    Level-branch-free variant of :func:`roi_pool_patches`: the caller
    row-concatenates every (image, level) section into a single
    (sum_l B*(H_l+patch), W_max+cpatch, C) buffer and folds the level/image
    base into ``rows``, so the per-box DMA is ONE unconditional async copy
    instead of a 2x4 ``pl.when`` fan over levels.  The per-box loop is
    scalar-control bound (~6 us/box measured on the branched kernel at
    production geometry), so removing the 8 predicated copy constructions
    per box is the point; the contraction math is identical.

    ``rows``/``cols``: (N,) int32 absolute patch origins into ``fcat``
    (cols % 8 == 0, both pre-clamped so the window stays inside its own
    section's padding).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rows.shape[0]
    c = fcat.shape[-1]
    cpatch = patch + 8
    r = resolution
    dtype = fcat.dtype
    grid = n // chunk
    assert n % chunk == 0, "caller pads N to a chunk multiple"

    def kernel(row_ref, col_ref, w_y_ref, w_x_ref, fref, out_ref,
               patch_scratch, sems):
        pid = pl.program_id(0)

        def mk(k, slot):
            i = pid * chunk + k
            return pltpu.make_async_copy(
                fref.at[pl.ds(row_ref[i], patch),
                        pl.ds(pl.multiple_of(col_ref[i], 8), cpatch), :],
                patch_scratch.at[slot],
                sems.at[slot],
            )

        # S-deep DMA pipeline (see roi_pool_patches for the slots=1 caveat)
        for w in range(min(slots - 1, chunk)):
            mk(w, w % slots).start()

        def body(k, _):
            cur = jax.lax.rem(k, slots)
            ahead = k + slots - 1

            @pl.when(ahead < chunk)
            def _():
                mk(ahead, jax.lax.rem(ahead, slots)).start()

            mk(k, cur).wait()
            p = patch_scratch[cur]                       # (patch, cpatch, C)
            a_y = w_y_ref[k].astype(dtype)               # (R, patch)
            a_x = w_x_ref[k].astype(dtype)               # (R, cpatch)
            t = jnp.dot(a_y, p.reshape(patch, cpatch * c),
                        preferred_element_type=jnp.float32)
            t = t.reshape(r, cpatch, c).astype(dtype)
            res = jax.lax.dot_general(
                a_x, t, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (R_j, R_i, C)
            out_ref[k] = jnp.transpose(res, (1, 0, 2)).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, r, patch), lambda i, rr, cc: (i, 0, 0)),
            pl.BlockSpec((chunk, r, cpatch), lambda i, rr, cc: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, r, r, c),
                               lambda i, rr, cc: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((slots, patch, cpatch, c), dtype),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, r, r, c), dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(rows, cols, ay, ax, fcat)


def resident_vmem_bytes(hs, ws, c_blk: int, patch: int,
                        itemsize: int) -> int:
    """VMEM scratch bytes for the resident kernel's per-image level
    sections (one C-block).  Sections hold the UNPADDED level (window
    origins are clamped inside and the hat weights shifted to match), so
    each is (max(H_l, patch), max(W_l, patch+8))."""
    cpatch = patch + 8
    return sum(max(int(h), patch) * max(int(w), cpatch) * c_blk * itemsize
               for h, w in zip(hs, ws))


@functools.partial(jax.jit, static_argnames=(
    "resolution", "patch", "chunk", "n_images", "c_split", "interpret"))
def roi_pool_resident(fmaps_padded: Tuple[jnp.ndarray, ...],
                      meta: jnp.ndarray, ay: jnp.ndarray, ax: jnp.ndarray,
                      resolution: int, patch: int, chunk: int,
                      n_images: int, c_split: int = 1,
                      interpret: bool = False) -> jnp.ndarray:
    """Pool N = n_images * boxes_per_image boxes -> (N, R, R, C) with the
    feature levels RESIDENT in VMEM.

    The patch-DMA kernel (:func:`roi_pool_patches`) re-reads every box's
    (patch, cpatch, C) window from HBM — ~1.4 MB per box at C=256 bf16,
    an 11 GB / 13.5 ms HBM floor for a batch-8 x 1008-box pool at 48-patch
    exactness.  Tree crowns are DENSE (hundreds per tile), so the windows
    overlap massively: this kernel instead copies each image's four level
    sections HBM->VMEM ONCE (~9.5 MB/image at C=256 bf16 after padding,
    0.6 ms for the whole batch) and slices every box's patch straight from
    the resident sections.  Per-box cost drops to the two hat-matrix MXU
    contractions.

    ``fmaps_padded``: per-level (B*(H_l+patch), W_l+cpatch, C) buffers —
    the SAME row-concatenated layout the patch-DMA kernel takes; image b of
    level l occupies rows [b*(H_l+patch), (b+1)*(H_l+patch)).  Only the
    UNPADDED (max(H_l, patch), max(W_l, cpatch)) top-left corner of each
    section is copied to VMEM: window origins must be pre-clamped by the
    caller to [0, sec_h-patch] x [0, sec_w-cpatch] with the hat weights
    shifted to match (a clamped window always contains the full in-image
    span of a fitting box, since origin+span <= dim-1).  Dropping the pad
    rows/cols cuts the scratch ~40% — necessary, because the backend's
    AOT path does not honor ``vmem_limit_bytes`` overrides and the padded
    c_split=2 footprint exceeded the 64 MiB scoped-vmem default.
    ``meta``: (N, 3) int32 [level, row0, col0] with row0 IMAGE-RELATIVE
    (no row base), clamped as above, and col0 % 8 == 0.  Boxes are
    image-grouped: box i belongs to image i // (N // n_images); the caller
    pads each image's box list to a multiple of ``chunk``.
    ``c_split``: process C in c_split blocks (grid dim) to bound the VMEM
    scratch; ``resident_vmem_bytes`` gives the per-block footprint.
    NOTE: c_blk = C/c_split must stay >= 128 (Mosaic requires output block
    minor dims divisible by 128) — the caller's split loop enforces it.

    Grid (n_images, c_split, chunks_per_image), last dim fastest: the level
    sections are refreshed once per (image, C-block) and stay resident for
    all of the image's chunks.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = meta.shape[0]
    c = fmaps_padded[0].shape[-1]
    cpatch = patch + 8
    r = resolution
    dtype = fmaps_padded[0].dtype
    n_levels = len(fmaps_padded)
    assert c % c_split == 0, (c, c_split)
    c_blk = c // c_split
    assert n % n_images == 0, (n, n_images)
    n_per = n // n_images
    assert n_per % chunk == 0, "caller pads each image's boxes to chunk"
    npc = n_per // chunk
    # per-image PADDED section heights in the source buffers, and the
    # smaller UNPADDED window actually copied to VMEM
    src_hs = [f.shape[0] // n_images for f in fmaps_padded]
    sec_hs = [max(h - patch, patch) for h in src_hs]
    sec_ws = [max(f.shape[1] - cpatch, cpatch) for f in fmaps_padded]

    def kernel(lvl_ref, row_ref, col_ref, w_y_ref, w_x_ref, *rest):
        frefs = rest[:n_levels]
        out_ref = rest[n_levels]
        secs = rest[n_levels + 1:n_levels + 1 + n_levels]
        sems = rest[n_levels + 1 + n_levels]
        b = pl.program_id(0)
        j = pl.program_id(2)
        cb = pl.program_id(1) * c_blk

        # refresh the resident sections when this grid step is the first
        # chunk of a new (image, C-block); issue all four copies, then wait
        # (their latencies overlap each other)
        @pl.when(j == 0)
        def _():
            for l in range(n_levels):
                pltpu.make_async_copy(
                    frefs[l].at[pl.ds(b * src_hs[l], sec_hs[l]),
                                pl.ds(0, sec_ws[l]), pl.ds(cb, c_blk)],
                    secs[l], sems.at[l]).start()
            for l in range(n_levels):
                pltpu.make_async_copy(
                    frefs[l].at[pl.ds(b * src_hs[l], sec_hs[l]),
                                pl.ds(0, sec_ws[l]), pl.ds(cb, c_blk)],
                    secs[l], sems.at[l]).wait()

        def body(k, _):
            i = (b * npc + j) * chunk + k
            lvl = lvl_ref[i]
            r0 = row_ref[i]
            c0 = pl.multiple_of(col_ref[i], 8)
            # contract in the feature dtype (bf16 in production): MXU-native
            # with f32 accumulation; f32 features (the interpret-mode parity
            # tests) keep exact f32 math
            a_y = w_y_ref[k].astype(dtype)               # (R, patch)
            a_x = w_x_ref[k].astype(dtype)               # (R, cpatch)
            for l in range(n_levels):
                @pl.when(lvl == l)
                def _(l=l):
                    p = secs[l][pl.ds(r0, patch), pl.ds(c0, cpatch), :]
                    t = jnp.dot(a_y, p.reshape(patch, cpatch * c_blk),
                                preferred_element_type=jnp.float32)
                    t = t.reshape(r, cpatch, c_blk).astype(dtype)
                    res = jax.lax.dot_general(
                        a_x, t, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (R_j, R_i, Cb)
                    out_ref[k] = jnp.transpose(
                        res, (1, 0, 2)).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_images, c_split, npc),
        in_specs=[
            pl.BlockSpec((chunk, r, patch),
                         lambda b, cb, j, *_: (b * npc + j, 0, 0)),
            pl.BlockSpec((chunk, r, cpatch),
                         lambda b, cb, j, *_: (b * npc + j, 0, 0)),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
        out_specs=pl.BlockSpec((chunk, r, r, c_blk),
                               lambda b, cb, j, *_: (b * npc + j, 0, 0, cb)),
        scratch_shapes=[
            pltpu.VMEM((h, w, c_blk), dtype)
            for h, w in zip(sec_hs, sec_ws)
        ] + [pltpu.SemaphoreType.DMA((n_levels,))],
    )
    # Mosaic's scoped accounting includes double-buffered blocks, stack
    # temps, and layout padding well beyond the raw scratch (measured
    # ~29 MB extra at production geometry) — hand it generous headroom.
    vmem_need = (resident_vmem_bytes(
        [h - patch for h in src_hs], [f.shape[1] - cpatch
                                      for f in fmaps_padded],
        c_blk, patch, np.dtype(dtype).itemsize)
        + (48 << 20))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, r, r, c), dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(int(vmem_need), 127 * 1024 * 1024)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(meta[:, 0], meta[:, 1], meta[:, 2], ay, ax, *fmaps_padded)
