"""Training loop: optax SGD+momentum, the reference's two presets, backbone
freezing, early stopping, and a mesh-sharded train step.

Preset parity with the reference (reference
``supplementary/train_foundation_model.py:179-191``):

=============== ========= ==========
preset          update    scratch
=============== ========= ==========
ims_per_batch   9         4
base_lr         0.005     0.01
max_iter        2000      2000
backbone_freeze 3 stages  3 stages
eval_period     100       100
patience        10        10 evals
=============== ========= ==========

The step jits over a ``jax.sharding.Mesh`` with the batch sharded along the
``data`` axis and params replicated — XLA inserts the gradient ``psum`` over
ICI (this is the multi-chip path exercised by ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from treedetection_tpu.models.mask_rcnn import MaskRCNN, MaskRCNNConfig, create_model
from treedetection_tpu.train.losses import mask_rcnn_losses

PRESETS = {
    # reference train_foundation_model.py:179-191
    "update": {"ims_per_batch": 9, "base_lr": 0.005, "max_iter": 2000,
               "backbone_freeze": 3, "eval_period": 100, "patience": 10},
    "scratch": {"ims_per_batch": 4, "base_lr": 0.01, "max_iter": 2000,
                "backbone_freeze": 3, "eval_period": 100, "patience": 10},
}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    preset: str = "update"
    base_lr: float = 0.005
    max_iter: int = 2000
    ims_per_batch: int = 9
    backbone_freeze: int = 3       # freeze stem + first N-1 res stages
    eval_period: int = 100
    patience: int = 10
    momentum: float = 0.9
    weight_decay: float = 1e-4
    warmup_iters: int = 100
    clip_grad_norm: float = 1.0    # detectron2 CLIP_GRADIENTS value
    max_gt: int = 64               # static GT budget per image
    max_eval_batches: int = 8      # cap per-eval cost
    # std used when normalizing uint8 shards on device.  "torchvision" for
    # from-scratch/std-normalized checkpoints (the default the shipped
    # example uses), "ones" when fine-tuning a converted detectron2-caffe
    # checkpoint (those weights expect std=1 inputs).
    pixel_std: str = "torchvision"

    @classmethod
    def from_preset(cls, name: str, **over) -> "TrainConfig":
        p = PRESETS[name]
        kwargs = dict(preset=name, base_lr=p["base_lr"], max_iter=p["max_iter"],
                      ims_per_batch=p["ims_per_batch"],
                      backbone_freeze=p["backbone_freeze"],
                      eval_period=p["eval_period"], patience=p["patience"])
        kwargs.update(over)  # explicit overrides win over preset values
        return cls(**kwargs)


def _freeze_mask(params: Dict, n_stages: int) -> Dict:
    """Zero-out gradient multiplier for frozen backbone params: stem + res2..
    res{n_stages+1} (detectron2 FREEZE_AT semantics)."""
    # detectron2 FREEZE_AT semantics: 0 freezes nothing, 1 the stem,
    # N >= 2 the stem + res2..res{N}
    frozen_prefixes = ["backbone/bottom_up/stem"] if n_stages >= 1 else []
    for s in range(2, 2 + max(n_stages - 1, 0)):
        frozen_prefixes.append(f"backbone/bottom_up/res{s}_")

    def label(path, _):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        # batch_stats are state, not weights: keep the optimizer (esp. weight
        # decay) off them — they update from the forward pass's aux instead
        if key.startswith("batch_stats"):
            return "frozen"
        return "frozen" if any(pfx in key for pfx in frozen_prefixes) else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(tc: TrainConfig, params: Dict) -> optax.GradientTransformation:
    # join_schedules passes (step - warmup_iters) to the second schedule, so
    # the decay boundaries must be expressed relative to the warmup end —
    # otherwise every decay fires warmup_iters steps late
    schedule = optax.join_schedules([
        optax.linear_schedule(tc.base_lr / 100, tc.base_lr, tc.warmup_iters),
        optax.piecewise_constant_schedule(
            tc.base_lr,
            {max(int(tc.max_iter * 0.7) - tc.warmup_iters, 1): 0.1,
             max(int(tc.max_iter * 0.9) - tc.warmup_iters, 2): 0.1}),
    ], [tc.warmup_iters])
    sgd = optax.chain(
        optax.clip_by_global_norm(tc.clip_grad_norm),
        optax.add_decayed_weights(tc.weight_decay),
        optax.sgd(schedule, momentum=tc.momentum),
    )
    labels = _freeze_mask(params, tc.backbone_freeze)
    return optax.multi_transform(
        {"train": sgd, "frozen": optax.set_to_zero()}, labels)


def _prep_batch(batch, pixel_std: str = "torchvision"):
    """Device-side input prep: uint8 raw-RGB shards are normalized here (BGR
    order + caffe means + the configured std — the host-side twin lives in
    ``train.data.make_training_tiles``), float shards pass through; masks cast
    to float32.  Keeps host->device transfers at uint8 width.

    ``pixel_std``: "torchvision" (from-scratch / std-normalized checkpoints)
    or "ones" (fine-tuning converted detectron2-caffe weights, which expect
    std=1 inputs — dividing by ~57 would silently shrink activations 57x).
    """
    img = batch["image"]
    if img.dtype == jnp.uint8:
        from treedetection_tpu.ops.image import TRAIN_PIXEL_STD_BGR, normalize_bgr
        std = (TRAIN_PIXEL_STD_BGR if pixel_std == "torchvision"
               else (1.0, 1.0, 1.0))
        img = normalize_bgr(img, pixel_std=std)
    masks = batch["masks"]
    if masks.dtype != jnp.float32:
        masks = masks.astype(jnp.float32)
    return img, masks


def make_train_step(model: MaskRCNN, optimizer: optax.GradientTransformation,
                    tc: Optional[TrainConfig] = None) -> Callable:
    """Build the jittable train step: (params, opt_state, batch, rng) ->
    (params, opt_state, metrics)."""
    pixel_std = tc.pixel_std if tc is not None else "torchvision"

    def step(params, opt_state, batch, rng):
        image, masks = _prep_batch(batch, pixel_std)

        def loss_fn(p):
            return mask_rcnn_losses(
                model, p, image, batch["boxes"], masks,
                batch["valid"], rng, return_state=True)

        (total, (parts, mut)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if mut:  # batch-norm mode: fold the updated running stats back in
            params = {**params, **mut}
        metrics = {"total_loss": total, **parts}
        return params, opt_state, metrics

    return step


def make_sharded_train_step(model, optimizer, mesh,
                            tc: Optional[TrainConfig] = None) -> Callable:
    """Jit the step over a mesh: batch sharded on the 'data' axis, params
    replicated; XLA inserts the gradient all-reduce."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {"image": data, "boxes": data, "masks": data, "valid": data}
    step = make_train_step(model, optimizer, tc)
    return jax.jit(step,
                   in_shardings=(repl, repl, batch_shardings, repl),
                   out_shardings=(repl, repl, repl))


def train_model(dataset: Iterable[Dict[str, np.ndarray]],
                val_dataset: Optional[Iterable] = None,
                model_cfg: Optional[MaskRCNNConfig] = None,
                train_cfg: Optional[TrainConfig] = None,
                init_params: Optional[Dict] = None,
                mesh=None,
                logger=None,
                checkpoint_dir: Optional[str] = None
                ) -> Tuple[Dict, Dict[str, list]]:
    """Fine-tune / train with early stopping (reference ``MyTrainer``
    patience semantics, ``train_foundation_model.py:193-195``).

    ``dataset`` yields dicts with image (B,S,S,3) float32 normalized,
    boxes (B,G,4), masks (B,G,S/4,S/4), valid (B,G).
    """
    tc = train_cfg or TrainConfig.from_preset("update")
    mc = model_cfg or MaskRCNNConfig()
    model = MaskRCNN(mc)
    if init_params is None:
        _, init_params = create_model(mc)
    # create_model initializes pinned to the host CPU (cheap tracing); move
    # the params to the default (accelerator) device BEFORE jitting the step,
    # or jax compiles and runs the whole training program on the CPU backend
    # the committed arrays live on.  The device must be explicit:
    # device_put(x) without one PRESERVES a committed array's placement.
    params = jax.device_put(init_params, jax.devices()[0])
    optimizer = make_optimizer(tc, params)
    opt_state = optimizer.init(params)

    if mesh is not None:
        step_fn = make_sharded_train_step(model, optimizer, mesh, tc)
    else:
        step_fn = jax.jit(make_train_step(model, optimizer, tc))

    rng = jax.random.PRNGKey(0)
    self_loss = (step_loss_only(model, tc.pixel_std)
                 if val_dataset is not None else None)
    history: Dict[str, list] = {"total_loss": [], "val_loss": []}
    best_val = float("inf")
    best_params = params
    bad_evals = 0
    it = 0
    data_iter = iter(dataset)
    t0 = time.time()

    def next_host_batch():
        nonlocal data_iter
        try:
            return next(data_iter)
        except StopIteration:
            data_iter = iter(dataset)
            return next(data_iter)

    # double-buffered host->device prefetch: batch k+1 uploads (async
    # device_put) while step k computes — on remote/tunneled backends the
    # upload otherwise serializes with the step and dominates wall-clock
    staged = jax.device_put(next_host_batch())
    while it < tc.max_iter:
        batch = staged
        if it + 1 < tc.max_iter:
            staged = jax.device_put(next_host_batch())
        rng, sub = jax.random.split(rng)
        params, opt_state, metrics = step_fn(params, opt_state, batch, sub)
        it += 1
        history["total_loss"].append(float(metrics["total_loss"]))
        if logger and it % 20 == 0:
            logger.info(f"iter {it}/{tc.max_iter} loss "
                        f"{history['total_loss'][-1]:.4f} "
                        f"({(time.time() - t0) / it:.2f}s/it)")
        if val_dataset is not None and it % tc.eval_period == 0:
            val = _evaluate(self_loss, params, val_dataset, rng,
                            tc.max_eval_batches, logger)
            if val is None:
                continue  # exhausted iterator: no signal, no early-stop tick
            history["val_loss"].append(val)
            if val < best_val:
                best_val = val
                best_params = params
                bad_evals = 0
                if checkpoint_dir:
                    save_checkpoint(checkpoint_dir, params)
            else:
                bad_evals += 1
                if bad_evals >= tc.patience:  # early stop
                    if logger:
                        logger.info(f"Early stop at iter {it} "
                                    f"(patience {tc.patience})")
                    return best_params, history
    return (best_params if val_dataset is not None else params), history


def step_loss_only(model, pixel_std: str = "torchvision"):
    @jax.jit
    def f(params, batch, rng):
        image, masks = _prep_batch(batch, pixel_std)
        total, _ = mask_rcnn_losses(model, params, image,
                                    batch["boxes"], masks,
                                    batch["valid"], rng)
        return total
    return f


def _evaluate(loss_fn, params, dataset, rng, max_batches: int = 8,
              logger=None) -> Optional[float]:
    """Mean val loss, or None when the dataset yields nothing — a one-shot
    generator exhausts after the FIRST eval, and mapping that to inf would
    count as a plateau and silently early-stop at the first checkpoint."""
    vals = []
    for i, batch in enumerate(dataset):
        if i >= max_batches:
            break
        vals.append(float(loss_fn(params, batch, rng)))
    if not vals:
        if logger:
            logger.warning(
                "val_dataset yielded no batches (exhausted one-shot "
                "iterator?) — skipping this eval; pass a re-iterable")
        return None
    return float(np.mean(vals))


def save_checkpoint(path: str, params: Dict) -> None:
    import orbax.checkpoint as ocp
    import os
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
