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

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        cs = ResNet(self.depth, dtype=self.dtype, remat=self.remat,
                    scan_blocks=self.scan_blocks, norm=self.norm,
                    name="bottom_up")(x)
        cs = [c.astype(self.dtype) for c in cs]
        return FPN(self.fpn_features, dtype=self.dtype, name="fpn")(cs)
