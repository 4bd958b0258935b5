"""ResNet-50/101 + FPN backbone in Flax (NHWC, frozen BN, bf16-ready).

Architecture matches the detectron2 ``mask_rcnn_R_*_FPN_3x`` backbone the
reference builds (reference ``config.py:25``): caffe-style bottlenecks with
the stride on the first 1x1 conv, frozen batch-norm folded into per-channel
scale/bias, FPN with 256 channels and a max-pool P6.

TPU notes: NHWC keeps the channel dim on the 128-lane axis; convs run in
bfloat16 when ``dtype=jnp.bfloat16`` (params stay fp32) which is the MXU
sweet spot; all shapes are static.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class FrozenBN(nn.Module):
    """Inference-mode batch norm folded to ``y = x * scale + bias``.

    detectron2 freezes all backbone BN (FrozenBatchNorm2d); the converter
    folds (gamma, beta, mean, var) into these two vectors.
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class ConvBN(nn.Module):
    """Conv + norm (+ ReLU).

    ``norm="frozen"`` (serving / fine-tuning converted checkpoints): the
    affine :class:`FrozenBN`.  ``norm="batch"`` (from-scratch training):
    real batch statistics via ``nn.BatchNorm`` — detectron2's FrozenBN is an
    identity at random init, leaving a 50-layer net with NO normalization,
    which is why from-scratch runs plateaued.  The BN param names (scale,
    bias under "norm") match FrozenBN's, so ``models.convert.
    fold_batch_stats`` turns a trained batch-norm checkpoint into a frozen
    one with the identical tree the serving path loads — zero serving cost.
    ``zero_gamma`` zero-initializes the BN scale (the standard residual-
    branch init for from-scratch training: every block starts as identity).
    """
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    relu: bool = True
    norm: str = "frozen"
    zero_gamma: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        if self.norm == "batch":
            # stats in fp32 (bf16 mean/var over millions of pixels loses
            # precision); always batch statistics — the running averages are
            # only accumulated for the fold-at-save
            x = nn.BatchNorm(
                use_running_average=False, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
                scale_init=(nn.initializers.zeros if self.zero_gamma
                            else nn.initializers.ones),
                name="norm")(x)
        else:
            x = FrozenBN(self.features, dtype=self.dtype, name="norm")(x)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    """Caffe-style bottleneck: stride lives on the first 1x1 conv
    (detectron2 ``stride_in_1x1=True`` for MSRA-origin checkpoints)."""
    width: int
    out_features: int
    stride: int = 1
    dtype: Any = jnp.float32
    norm: str = "frozen"

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.out_features or self.stride != 1:
            shortcut = ConvBN(self.out_features, kernel=1, stride=self.stride,
                              dtype=self.dtype, relu=False, norm=self.norm,
                              name="shortcut")(x)
        y = ConvBN(self.width, kernel=1, stride=self.stride,
                   dtype=self.dtype, norm=self.norm, name="conv1")(x)
        y = ConvBN(self.width, kernel=3, stride=1, dtype=self.dtype,
                   norm=self.norm, name="conv2")(y)
        y = ConvBN(self.out_features, kernel=1, stride=1, dtype=self.dtype,
                   relu=False, norm=self.norm,
                   zero_gamma=self.norm == "batch", name="conv3")(y)
        return nn.relu(y + shortcut.astype(y.dtype))


class _ScanBody(nn.Module):
    """One stride-1 bottleneck as a ``nn.scan`` body: params carry a leading
    stacked-block axis, the feature map is the carry."""
    width: int
    out_features: int
    dtype: Any = jnp.float32
    remat: bool = False
    norm: str = "frozen"

    @nn.compact
    def __call__(self, x, _):
        cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        y = cls(self.width, self.out_features, stride=1, dtype=self.dtype,
                norm=self.norm, name="block")(x)
        return y, None


def fold_kernel_w(w: jnp.ndarray) -> jnp.ndarray:
    """Fold a stride-1 SAME conv kernel for W-paired inputs.

    W-folding packs adjacent W-pixel pairs into channels — a FREE reshape
    in NHWC (``x.reshape(B, H, W//2, 2*C)``) — so 64-channel res2 convs
    become 128-channel ones and fill the 128-lane MXU (measured 18% -> ~73%
    MFU at res2 geometry).  The folded kernel computes EXACTLY the original
    conv: output folded pixel ``(h, w2)`` holds original outputs
    ``(h, 2*w2+q)``; original column offset ``o = q + dw - (k//2)`` lands in
    folded column ``floor(o/2)`` at pair slot ``o mod 2``.  Out-of-range
    ``(q, f, p)`` combinations are structural zeros, which also makes SAME
    padding match: the folded pad column only ever multiplies zero blocks
    beyond the original pad.

    (k, k, cin, cout) -> (k, k', 2*cin, 2*cout) with k' = k for odd k
    (2x the FLOPs, ~4x the MXU fill for 64-channel convs).
    """
    k = w.shape[0]
    kw = w.shape[1]
    cin, cout = w.shape[2], w.shape[3]
    assert kw % 2 == 1, "W-fold expects an odd kernel width (SAME conv)"
    half = kw // 2
    # folded tap range derived from the ACTUAL offsets: o = q + dw - half
    # over q in {0,1}, dw in [0, kw) -> o in [-half, half+1], f = floor(o/2).
    # Both extremes equal ceil(half/2) in magnitude, so the folded kernel is
    # always odd-width with symmetric SAME padding (asserted below; a closed
    # -form fmin once over-extended the range for even half, shifting the
    # folded padding by one tap for kw in {5, 9, ...}).
    offsets = [q + dw - half for q in range(2) for dw in range(kw)]
    fmin = min(o // 2 for o in offsets)
    fmax = max(o // 2 for o in offsets)
    kf = fmax - fmin + 1
    assert kf % 2 == 1 and (kf - 1) // 2 == -fmin, \
        f"W-fold padding asymmetric for kw={kw} (kf={kf}, fmin={fmin})"
    out = jnp.zeros((k, kf, 2 * cin, 2 * cout), dtype=w.dtype)
    for q in range(2):
        for dw in range(kw):
            o = q + dw - half
            f = o // 2          # floor division (negative-safe)
            p = o - 2 * f
            out = out.at[:, f - fmin,
                         p * cin:(p + 1) * cin,
                         q * cout:(q + 1) * cout].set(w[:, dw])
    return out


class _ConvKernelParam(nn.Module):
    """Param-only twin of ``nn.Conv(name=...)``: declares the identical
    ``<name>/kernel`` leaf so folded execution paths share the canonical
    checkpoint tree."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _AffineParams(nn.Module):
    """Param-only twin of :class:`FrozenBN` (``<name>/scale|bias``)."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class ConvBNFoldedW(nn.Module):
    """W-folded execution of :class:`ConvBN` (stride 1, frozen norm only).

    Same param tree as ``ConvBN(features, kernel)``; input/output are
    W-folded ``(B, H, W/2, 2*C)`` tensors.  The kernel fold runs at trace
    time on the canonical weights (KB-sized; negligible per call)."""
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32
    relu: bool = True

    @nn.compact
    def __call__(self, xf):
        cin = xf.shape[-1] // 2
        w = _ConvKernelParam((self.kernel, self.kernel, cin, self.features),
                             name="conv")()
        wf = fold_kernel_w(w).astype(self.dtype)
        pad_h = (self.kernel - 1) // 2
        pad_w = (wf.shape[1] - 1) // 2
        y = jax.lax.conv_general_dilated(
            xf, wf, (1, 1), [(pad_h, pad_h), (pad_w, pad_w)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        scale, bias = _AffineParams(self.features, name="norm")()
        scale2 = jnp.concatenate([scale, scale]).astype(self.dtype)
        bias2 = jnp.concatenate([bias, bias]).astype(self.dtype)
        y = y * scale2 + bias2
        return nn.relu(y) if self.relu else y


class BottleneckFoldedW(nn.Module):
    """W-folded twin of :class:`Bottleneck` (stride-1 blocks only); child
    names match so the canonical param tree applies unchanged."""
    width: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf):
        shortcut = xf
        if xf.shape[-1] != 2 * self.out_features:
            shortcut = ConvBNFoldedW(self.out_features, kernel=1,
                                     dtype=self.dtype, relu=False,
                                     name="shortcut")(xf)
        y = ConvBNFoldedW(self.width, kernel=1, dtype=self.dtype,
                          name="conv1")(xf)
        y = ConvBNFoldedW(self.width, kernel=3, dtype=self.dtype,
                          name="conv2")(y)
        y = ConvBNFoldedW(self.out_features, kernel=1, dtype=self.dtype,
                          relu=False, name="conv3")(y)
        return nn.relu(y + shortcut.astype(y.dtype))


class _ScanBodyFoldedW(nn.Module):
    """W-folded twin of :class:`_ScanBody` (same stacked-param layout)."""
    width: int
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, _):
        y = BottleneckFoldedW(self.width, self.out_features,
                              dtype=self.dtype, name="block")(x)
        return y, None


class ResNet(nn.Module):
    """``scan_blocks`` (default) runs each stage's identical stride-1
    bottlenecks (blocks 1..N-1) via ``lax.scan`` over weight-stacked params:
    XLA compiles the block body ONCE per stage instead of unrolling 22 copies
    for R101's res4, cutting compile time ~2.5x and serialized-executable
    size ~4x (which is the warm-start floor on remote backends).  Math is
    identical — the same conv sequence runs per iteration.  Param layout:
    ``res{s}_0`` (the strided block) + ``res{s}_rest/block`` (stacked);
    ``models.convert.restack_backbone`` migrates legacy unrolled trees."""
    depth: int = 101
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize bottlenecks (training memory saver)
    scan_blocks: bool = True
    norm: str = "frozen"
    # W-folded res2 (serving only): res2's 64-channel convs run at ~18% MFU
    # (half-empty 128-lane MXU); executing the stage on W-paired channels
    # doubles the FLOPs but ~4x the fill.  Identical math + param tree
    # (fold_kernel_w); requires norm == "frozen" and stride-1 res2.
    fold_w: bool = False

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        """-> [C2, C3, C4, C5] feature maps (strides 4, 8, 16, 32)."""
        blocks = STAGE_BLOCKS[self.depth]
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        x = ConvBN(64, kernel=7, stride=2, dtype=self.dtype, norm=self.norm,
                   name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        width, features = 64, 256
        for stage, n_blocks in enumerate(blocks):
            if (stage == 0 and self.fold_w and self.norm == "frozen"
                    and not self.remat and x.shape[2] % 2 == 0):
                b, h, w_, c = x.shape
                xf = x.reshape(b, h, w_ // 2, 2 * c)      # free in NHWC
                xf = BottleneckFoldedW(width, features, dtype=self.dtype,
                                       name="res2_0")(xf)
                if n_blocks > 1 and self.scan_blocks:
                    scan = nn.scan(_ScanBodyFoldedW,
                                   variable_axes={"params": 0},
                                   split_rngs={"params": True},
                                   length=n_blocks - 1)
                    xf, _ = scan(width, features, dtype=self.dtype,
                                 name="res2_rest")(xf, None)
                else:
                    for i in range(1, n_blocks):
                        xf = BottleneckFoldedW(width, features,
                                               dtype=self.dtype,
                                               name=f"res2_{i}")(xf)
                x = xf.reshape(b, h, w_, features)
                outs.append(x)
                width *= 2
                features *= 2
                continue
            stride = 1 if stage == 0 else 2
            x = block_cls(width, features, stride=stride, dtype=self.dtype,
                          norm=self.norm, name=f"res{stage + 2}_0")(x)
            if n_blocks > 1 and self.scan_blocks:
                scan = nn.scan(_ScanBody,
                               variable_axes={"params": 0, "batch_stats": 0},
                               split_rngs={"params": True},
                               length=n_blocks - 1)
                x, _ = scan(width, features, dtype=self.dtype,
                            remat=self.remat, norm=self.norm,
                            name=f"res{stage + 2}_rest")(x, None)
            else:
                for i in range(1, n_blocks):
                    x = block_cls(width, features, stride=1, dtype=self.dtype,
                                  norm=self.norm,
                                  name=f"res{stage + 2}_{i}")(x)
            outs.append(x)
            width *= 2
            features *= 2
        return outs


class FPN(nn.Module):
    """Feature Pyramid Network: lateral 1x1 + output 3x3 convs, nearest
    top-down upsampling, P6 = stride-2 max-pool of P5."""
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """[C2..C5] -> [P2, P3, P4, P5, P6]."""
        laterals = [
            nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype,
                    name=f"lateral{i + 2}")(c)
            for i, c in enumerate(inputs)
        ]
        # top-down pathway: nearest x2 upsample == exact repeat (cheaper and
        # more robust than gather-based image resize on TPU backends)
        for i in range(len(laterals) - 2, -1, -1):
            up = laterals[i + 1]
            up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                    dtype=self.dtype, name=f"output{i + 2}")(l)
            for i, l in enumerate(laterals)
        ]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        outs.append(p6)
        return outs


class ResNetFPN(nn.Module):
    depth: int = 101
    fpn_features: int = 256
    dtype: Any = jnp.float32
    remat: bool = False
    scan_blocks: bool = True
    norm: str = "frozen"
    fold_w: bool = False

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        cs = ResNet(self.depth, dtype=self.dtype, remat=self.remat,
                    scan_blocks=self.scan_blocks, norm=self.norm,
                    fold_w=self.fold_w, name="bottom_up")(x)
        cs = [c.astype(self.dtype) for c in cs]
        return FPN(self.fpn_features, dtype=self.dtype, name="fpn")(cs)
