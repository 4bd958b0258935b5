"""Anchor generation for the RPN — detectron2 ``DefaultAnchorGenerator``
conventions (offset 0, base anchors centered on the grid points), precomputed
as static constants per input resolution.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def base_anchors(size: float, ratios: Sequence[float]) -> np.ndarray:
    """(A, 4) anchors centered at (0, 0) with the given area and aspect ratios."""
    out = []
    area = size * size
    for r in ratios:
        w = math.sqrt(area / r)
        h = w * r
        out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)


def grid_anchors(feat_h: int, feat_w: int, stride: int, size: float,
                 ratios: Sequence[float]) -> np.ndarray:
    """(H*W*A, 4) anchors for one FPN level (row-major grid, anchors fastest)."""
    base = base_anchors(size, ratios)                        # (A, 4)
    shifts_x = np.arange(feat_w, dtype=np.float32) * stride
    shifts_y = np.arange(feat_h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shifts_x, shifts_y)                 # (H, W)
    shifts = np.stack([sx, sy, sx, sy], axis=-1)             # (H, W, 4)
    anchors = shifts[:, :, None, :] + base[None, None, :, :]  # (H, W, A, 4)
    return anchors.reshape(-1, 4)


def pyramid_anchors(input_size: int,
                    strides: Sequence[int] = (4, 8, 16, 32, 64),
                    sizes: Sequence[float] = (32, 64, 128, 256, 512),
                    ratios: Sequence[float] = (0.5, 1.0, 2.0)
                    ) -> List[np.ndarray]:
    """Anchors for every FPN level of a square ``input_size`` image."""
    out = []
    for stride, size in zip(strides, sizes):
        fh = fw = int(math.ceil(input_size / stride))
        out.append(grid_anchors(fh, fw, stride, size, ratios))
    return out


def grid_anchors_jnp(feat_h: int, feat_w: int, stride: int, size: float,
                     ratios: Sequence[float]) -> jnp.ndarray:
    """On-device twin of :func:`grid_anchors` built from ``jnp.arange``
    (lowers to iota).

    Embedding the precomputed grids as jit constants put ~130 MB of literals
    into the traced module (P2 alone is 196k x 4 f32 at 1024^2 input), which
    made every serialized executable ~20 MB and persistent-cache loads/
    compiles tunnel-transfer-bound.  Generated from iota the executable
    carries only the (A, 4) base table.  Bit-identical to the numpy version
    (same f32 ops, same order)."""
    base = jnp.asarray(base_anchors(size, ratios))                  # (A, 4)
    shifts_x = jnp.arange(feat_w, dtype=jnp.float32) * float(stride)
    shifts_y = jnp.arange(feat_h, dtype=jnp.float32) * float(stride)
    sx = jnp.broadcast_to(shifts_x[None, :], (feat_h, feat_w))
    sy = jnp.broadcast_to(shifts_y[:, None], (feat_h, feat_w))
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)                   # (H, W, 4)
    anchors = shifts[:, :, None, :] + base[None, None, :, :]
    return anchors.reshape(-1, 4)


def pyramid_anchors_jnp(input_size: int,
                        strides: Sequence[int] = (4, 8, 16, 32, 64),
                        sizes: Sequence[float] = (32, 64, 128, 256, 512),
                        ratios: Sequence[float] = (0.5, 1.0, 2.0)
                        ) -> List[jnp.ndarray]:
    """On-device anchors for every FPN level (see :func:`grid_anchors_jnp`)."""
    out = []
    for stride, size in zip(strides, sizes):
        fh = fw = int(math.ceil(input_size / stride))
        out.append(grid_anchors_jnp(fh, fw, stride, size, ratios))
    return out
