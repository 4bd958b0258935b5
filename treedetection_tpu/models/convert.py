"""detectron2 ``.pth`` checkpoint -> Flax param tree conversion.

The reference loads detectron2 Mask R-CNN weights (``model_combined.pth``,
reference ``config.py:38-41``, ``example/config.yml:7``).  This module maps
that state dict onto :class:`treedetection_tpu.models.MaskRCNN` params:

* conv kernels: torch OIHW -> flax HWIO
* ConvTranspose kernels: torch (in, out, kh, kw) -> flax (kh, kw, in, out)
* FrozenBatchNorm (gamma, beta, mean, var) folded into FrozenBN (scale, bias)
* box-head fc1: column permutation from CHW-flatten (torch) to HWC-flatten
  (our ROIAlign output layout)
* linear weights transposed (torch (out, in) -> flax (in, out))

Layout conventions are pinned by torch-oracle tests in
``tests/test_convert.py`` so a real checkpoint converts bit-exactly.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

BN_EPS = 1e-5  # detectron2 FrozenBatchNorm2d epsilon


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def fold_frozen_bn(gamma: np.ndarray, beta: np.ndarray, mean: np.ndarray,
                   var: np.ndarray, eps: float = BN_EPS) -> Tuple[np.ndarray, np.ndarray]:
    """(gamma, beta, running_mean, running_var) -> (scale, bias) such that
    ``x * scale + bias == (x - mean) / sqrt(var + eps) * gamma + beta``."""
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def fold_batch_stats(variables: Mapping[str, Any],
                     eps: float = BN_EPS) -> Dict[str, Any]:
    """Fold a batch-norm-trained checkpoint into the frozen serving layout.

    A model trained with ``MaskRCNNConfig(norm="batch")`` carries
    ``{"params": ..., "batch_stats": ...}`` where every backbone ``norm``
    module has (scale, bias) params and (mean, var) running stats.  The
    serving model (``norm="frozen"``) computes ``x * scale + bias`` — so fold
    the stats into the affine exactly like :func:`fold_frozen_bn` does for
    detectron2 checkpoints and return a params-only tree with the IDENTICAL
    structure frozen-mode ``model.init`` produces.  No-op (returns params
    unchanged) when there are no batch_stats.
    """
    params = variables.get("params", variables)
    stats = variables.get("batch_stats") or {}

    def rec(p, s):
        if isinstance(p, Mapping):
            out = {}
            for k, v in p.items():
                if k in (s or {}) and isinstance(s[k], Mapping) \
                        and set(s[k].keys()) == {"mean", "var"} \
                        and set(v.keys()) >= {"scale", "bias"}:
                    gamma = np.asarray(v["scale"], np.float32)
                    beta = np.asarray(v["bias"], np.float32)
                    mean = np.asarray(s[k]["mean"], np.float32)
                    var = np.asarray(s[k]["var"], np.float32)
                    scale, bias = fold_frozen_bn(gamma, beta, mean, var, eps)
                    out[k] = {"scale": scale, "bias": bias}
                else:
                    out[k] = rec(v, (s or {}).get(k))
            return out
        return np.asarray(p)

    return {"params": rec(params, stats)}


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out).  Flax's ConvTranspose (transpose_kernel=False) computes
    a fractionally-strided conv with the UNFLIPPED kernel, while torch's
    ConvTranspose2d applies the kernel flipped — so flip spatially here.
    Pinned by ``tests/test_convert.py::test_deconv_parity``."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def linear_weight(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w)


def fc1_weight_chw_to_hwc(w: np.ndarray, channels: int, resolution: int) -> np.ndarray:
    """Permute fc1 input columns from torch's CHW flatten of the (C, R, R)
    pooled feature to our HWC flatten of (R, R, C)."""
    out_dim = w.shape[0]
    w4 = w.reshape(out_dim, channels, resolution, resolution)
    w4 = np.transpose(w4, (0, 2, 3, 1))  # -> (out, R, R, C)
    return np.transpose(w4.reshape(out_dim, -1))  # flax (in, out)


def _get_bn(sd: Mapping[str, Any], prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    return fold_frozen_bn(
        _to_numpy(sd[f"{prefix}.weight"]),
        _to_numpy(sd[f"{prefix}.bias"]),
        _to_numpy(sd[f"{prefix}.running_mean"]),
        _to_numpy(sd[f"{prefix}.running_var"]),
    )


def _stack_trees(trees):
    """Leaf-wise stack of same-structure dicts along a new leading axis (the
    ``nn.scan`` stacked-block layout)."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _stack_trees([t[k] for t in trees]) for k in first}
    return np.stack([np.asarray(t) for t in trees])


def convert_detectron2_state_dict(sd: Mapping[str, Any], depth: int = 101,
                                  fpn_channels: int = 256,
                                  box_pool: int = 7,
                                  scan: bool = True) -> Dict[str, Any]:
    """Map a detectron2 Mask R-CNN (R-FPN) state dict to our param tree.

    Returns the ``{"params": ...}`` pytree accepted by ``MaskRCNN.apply``.
    ``scan`` selects the stacked-block backbone layout (``res{s}_0`` +
    ``res{s}_rest/block``, matching ``MaskRCNNConfig.scan_blocks=True``);
    ``scan=False`` produces the legacy unrolled ``res{s}_{i}`` layout.
    """
    from treedetection_tpu.models.resnet import STAGE_BLOCKS
    blocks = STAGE_BLOCKS[depth]

    def convbn(src: str) -> Dict[str, Any]:
        scale, bias = _get_bn(sd, f"{src}.norm")
        return {
            "conv": {"kernel": conv_kernel(_to_numpy(sd[f"{src}.weight"]))},
            "norm": {"scale": scale, "bias": bias},
        }

    bottom_up: Dict[str, Any] = {"stem": convbn("backbone.bottom_up.stem.conv1")}
    for stage, n_blocks in enumerate(blocks):
        s = stage + 2
        stage_blocks = []
        for i in range(n_blocks):
            src = f"backbone.bottom_up.res{s}.{i}"
            block: Dict[str, Any] = {
                "conv1": convbn(f"{src}.conv1"),
                "conv2": convbn(f"{src}.conv2"),
                "conv3": convbn(f"{src}.conv3"),
            }
            if f"{src}.shortcut.weight" in sd:
                block["shortcut"] = convbn(f"{src}.shortcut")
            stage_blocks.append(block)
        bottom_up[f"res{s}_0"] = stage_blocks[0]
        if scan and len(stage_blocks) > 1:
            bottom_up[f"res{s}_rest"] = {
                "block": _stack_trees(stage_blocks[1:])}
        else:
            for i, block in enumerate(stage_blocks[1:], start=1):
                bottom_up[f"res{s}_{i}"] = block

    fpn: Dict[str, Any] = {}
    for lvl in range(2, 6):
        fpn[f"lateral{lvl}"] = {
            "kernel": conv_kernel(_to_numpy(sd[f"backbone.fpn_lateral{lvl}.weight"])),
            "bias": _to_numpy(sd[f"backbone.fpn_lateral{lvl}.bias"]),
        }
        fpn[f"output{lvl}"] = {
            "kernel": conv_kernel(_to_numpy(sd[f"backbone.fpn_output{lvl}.weight"])),
            "bias": _to_numpy(sd[f"backbone.fpn_output{lvl}.bias"]),
        }

    rpn = {
        "conv": {
            "kernel": conv_kernel(_to_numpy(sd["proposal_generator.rpn_head.conv.weight"])),
            "bias": _to_numpy(sd["proposal_generator.rpn_head.conv.bias"]),
        },
        "objectness_logits": {
            "kernel": conv_kernel(_to_numpy(sd["proposal_generator.rpn_head.objectness_logits.weight"])),
            "bias": _to_numpy(sd["proposal_generator.rpn_head.objectness_logits.bias"]),
        },
        "anchor_deltas": {
            "kernel": conv_kernel(_to_numpy(sd["proposal_generator.rpn_head.anchor_deltas.weight"])),
            "bias": _to_numpy(sd["proposal_generator.rpn_head.anchor_deltas.bias"]),
        },
    }

    box_head = {
        "fc1": {
            "kernel": fc1_weight_chw_to_hwc(
                _to_numpy(sd["roi_heads.box_head.fc1.weight"]), fpn_channels, box_pool),
            "bias": _to_numpy(sd["roi_heads.box_head.fc1.bias"]),
        },
        "fc2": {
            "kernel": linear_weight(_to_numpy(sd["roi_heads.box_head.fc2.weight"])),
            "bias": _to_numpy(sd["roi_heads.box_head.fc2.bias"]),
        },
        "cls_score": {
            "kernel": linear_weight(_to_numpy(sd["roi_heads.box_predictor.cls_score.weight"])),
            "bias": _to_numpy(sd["roi_heads.box_predictor.cls_score.bias"]),
        },
        "bbox_pred": {
            "kernel": linear_weight(_to_numpy(sd["roi_heads.box_predictor.bbox_pred.weight"])),
            "bias": _to_numpy(sd["roi_heads.box_predictor.bbox_pred.bias"]),
        },
    }

    mask_head: Dict[str, Any] = {}
    for i in range(1, 5):
        mask_head[f"mask_fcn{i}"] = {
            "kernel": conv_kernel(_to_numpy(sd[f"roi_heads.mask_head.mask_fcn{i}.weight"])),
            "bias": _to_numpy(sd[f"roi_heads.mask_head.mask_fcn{i}.bias"]),
        }
    mask_head["deconv"] = {
        "kernel": deconv_kernel(_to_numpy(sd["roi_heads.mask_head.deconv.weight"])),
        "bias": _to_numpy(sd["roi_heads.mask_head.deconv.bias"]),
    }
    mask_head["predictor"] = {
        "kernel": conv_kernel(_to_numpy(sd["roi_heads.mask_head.predictor.weight"])),
        "bias": _to_numpy(sd["roi_heads.mask_head.predictor.bias"]),
    }

    params = {
        "backbone": {"bottom_up": bottom_up, "fpn": fpn},
        "rpn_head": rpn,
        "box_head": box_head,
        "mask_head": mask_head,
    }
    # Host-side cast ONLY: every leaf stays a numpy array.  A per-leaf
    # jnp.asarray here compiles one convert_element_type program per distinct
    # shape on the active backend — ~500 mini-compiles that cost ~0.4 s each
    # through a remote relay (minutes of "checkpoint load").  The caller does
    # a single jax.device_put of the whole tree instead.
    params = _tree_map_np(lambda a: np.asarray(a, dtype=np.float32), params)
    return {"params": params}


def _tree_map_np(fn, tree):
    if isinstance(tree, dict):
        return {k: _tree_map_np(fn, v) for k, v in tree.items()}
    return fn(tree)


def save_checkpoint_npz(path: str, params: Dict[str, Any],
                        dtype=np.float16) -> None:
    """Serialize a param pytree to one compressed ``.npz`` (keys are
    ``/``-joined paths).  fp16 storage halves the file — safe for inference
    checkpoints that run in bfloat16 anyway."""
    flat: Dict[str, np.ndarray] = {}

    def rec(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            src = np.asarray(tree)
            with np.errstate(over="ignore"):  # overflow handled below
                cast = src.astype(dtype)
            # fp16 overflows |w|>65504 to inf — always corrupting — and
            # flushes values below ~3e-8 to zero.  A single stray sub-1e-8
            # weight in a multi-million-entry stacked kernel is noise (its
            # contribution is ~1e6x below its neighbors'), but a tensor
            # where MANY values flush (e.g. a folded frozen-BN scale vector
            # after high-variance training) would be corrupted
            # multiplicatively — keep those at fp32.  The old any()-flush
            # guard kept 36M of a trained R50's 44M params at fp32 over a
            # handful of stray ~1e-8 weights (148 MB npz instead of ~84).
            if dtype == np.float16 and src.size:
                finite = np.isfinite(src)
                flushed = (src != 0) & finite & (cast == 0)
                n_flushed = int(flushed.sum())
                nonzero = max(int(((src != 0) & finite).sum()), 1)
                # small tensors (the folded frozen-BN scale/bias vectors and
                # other norm affines) get the strict any()-flush guard: a
                # couple of legitimately tiny channels zeroed out of 256 is
                # multiplicative corruption, and keeping a KB-sized vector
                # at fp32 costs nothing
                small = src.size < 10_000
                if (not np.isfinite(cast[finite]).all()
                        or (n_flushed > 0 if small
                            else n_flushed / nonzero > 0.01)):
                    cast = src.astype(np.float32)
                elif n_flushed:
                    # degradation accepted (<=1% of a large tensor) but
                    # never silent
                    import logging
                    logging.getLogger("treedetection_tpu").warning(
                        f"fp16 checkpoint save flushed {n_flushed} tiny "
                        f"value(s) to zero in {prefix!r} "
                        f"({src.size} entries)")
            flat[prefix] = cast

    rec("", params)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **flat)
    import os
    os.replace(tmp, path)


def _load_npz_checkpoint(path: str, dtype=np.float32) -> Dict[str, Any]:
    # numpy-only: see load_torch_state_dict — per-leaf jnp.asarray triggers
    # one remote convert_element_type compile per shape (minutes on a relay).
    # ``dtype=None`` keeps each leaf's stored dtype (fp16 checkpoints stay
    # half-width for callers that run bf16 compute anyway).
    out: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            arr = z[key]
            node[parts[-1]] = (arr[...] if dtype is None
                               else np.asarray(arr, dtype=dtype))
    return out


def restack_backbone(params: Dict[str, Any], scan: bool = True
                     ) -> Dict[str, Any]:
    """Migrate the backbone block layout in-place-free between the legacy
    unrolled form (``res{s}_{i}`` for every block) and the scanned form
    (``res{s}_0`` + ``res{s}_rest/block`` with a leading stacked axis).

    No-op when the tree already has the requested layout, so it is safe to
    call on every checkpoint load (old shipped ``.npz``/orbax checkpoints
    keep loading after the ``scan_blocks`` model change).
    """
    import re
    tree = params.get("params", params)
    bottom_up = tree.get("backbone", {}).get("bottom_up")
    if not isinstance(bottom_up, dict):
        return params
    names = list(bottom_up.keys())
    unrolled = sorted(
        (m for m in (re.match(r"res(\d+)_(\d+)$", n) for n in names) if m),
        key=lambda m: (int(m.group(1)), int(m.group(2))))
    has_rest = any(n.endswith("_rest") for n in names)
    new_bu = dict(bottom_up)
    if scan and not has_rest:
        stages: Dict[int, list] = {}
        for m in unrolled:
            stages.setdefault(int(m.group(1)), []).append(m)
        for s, ms in stages.items():
            if len(ms) < 2:
                continue
            rest = [new_bu.pop(m.group(0)) for m in ms[1:]]
            new_bu[f"res{s}_rest"] = {"block": _stack_trees(rest)}
    elif not scan and has_rest:
        for n in [n for n in names if n.endswith("_rest")]:
            s = int(re.match(r"res(\d+)_rest", n).group(1))
            stacked = new_bu.pop(n)["block"]
            length = len(_first_leaf(stacked))

            def take(t, i):
                if isinstance(t, dict):
                    return {k: take(v, i) for k, v in t.items()}
                return np.asarray(t)[i]

            for i in range(length):
                new_bu[f"res{s}_{i + 1}"] = take(stacked, i)
    else:
        return params
    tree = dict(tree)
    tree["backbone"] = dict(tree["backbone"])
    tree["backbone"]["bottom_up"] = new_bu
    return {"params": tree} if "params" in params else tree


def _first_leaf(tree):
    while isinstance(tree, dict):
        tree = next(iter(tree.values()))
    return tree


def load_checkpoint(path: str, depth: int = 101,
                    scan: bool = True, param_dtype=np.float32
                    ) -> Dict[str, Any]:
    """Load a model checkpoint: detectron2 ``.pth`` (torch), compact ``.npz``
    (:func:`save_checkpoint_npz`), or our own orbax format
    (``.ckpt``/directory).  The backbone block layout is migrated to match
    ``scan`` (see :func:`restack_backbone`).

    ``param_dtype`` applies to ``.npz`` checkpoints only: ``None`` keeps each
    leaf's stored dtype (half-width fp16 leaves stay fp16 — correct for bf16
    serving, where ``astype(bf16)`` of the fp16 value rounds identically to
    ``astype(bf16)`` of its fp32 widening); the fp32 default suits training
    and fp32-compute paths."""
    if path.endswith(".pth") or path.endswith(".pkl"):
        import torch
        blob = torch.load(path, map_location="cpu", weights_only=False)
        sd = blob.get("model", blob) if isinstance(blob, dict) else blob
        return convert_detectron2_state_dict(sd, depth=depth, scan=scan)
    if path.endswith(".npz"):
        return restack_backbone(_load_npz_checkpoint(path, dtype=param_dtype),
                                scan=scan)
    # orbax checkpoint directory
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return restack_backbone(ckptr.restore(path), scan=scan)
