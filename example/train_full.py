"""Train the production-scale example checkpoint on the bundled sample.

The real-checkpoint path of the closed training loop (VERDICT r1 item 1b):
Voronoi autolabels from the real nDSM -> 1024^2 uint8 training tiles ->
from-scratch R50 Mask R-CNN at the serving resolution -> orbax checkpoint at
``example/data/model_full.ckpt`` that ``example/config.yml`` serves
(``combined_model``), with eval F1 against the autolabels recorded to
``example/data/train_full_report.json``.

Run ON TPU (the default backend):  ``python example/train_full.py``
Smoke-run on CPU:  ``python example/train_full.py --iters 3 --input-size 256``

Reference counterparts: ``supplementary/pretraining_generate_voronoi.py`` ->
``supplementary/train_foundation_model.py`` (scratch preset)
-> ``supplementary/training_validation.py``.
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=1500)
    parser.add_argument("--input-size", type=int, default=1024)
    parser.add_argument("--depth", type=int, default=50)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--max-gt", type=int, default=48)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--preset", default="scratch",
                        choices=("scratch", "update"))
    parser.add_argument("--init-from", default=None,
                        help="checkpoint to continue from (.npz/.pth/orbax); "
                             "use with --preset update")
    parser.add_argument("--ckpt", default=os.path.join(HERE, "data",
                                                       "model_full.ckpt"))
    parser.add_argument("--holdout-frac", type=float, default=0.0,
                        help="spatially hold out a centered interior strip "
                             "covering this fraction of the sample from "
                             "training (0 disables); the held-out bounds land "
                             "in data/holdout.json for evaluate.py")
    parser.add_argument("--freeze", type=int, default=None,
                        help="backbone stages to freeze; default 3 when "
                             "continuing from a pretrained checkpoint "
                             "(reference preset), 0 for random init (freezing "
                             "random weights cripples learning)")
    parser.add_argument("--norm", default=None, choices=("frozen", "batch"),
                        help="backbone norm; default 'batch' (real BN, folded "
                             "to frozen at save) for random init, 'frozen' "
                             "when continuing from a checkpoint")
    parser.add_argument("--labels", default=None,
                        help="crown label gpkg to train on (default: the "
                             "Voronoi autolabels; pass "
                             "data/autolabels_consensus.gpkg for the "
                             "generator-consensus set)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s")
    log = logging.getLogger("train_full")

    sys.path.insert(0, HERE)
    from example import ensure_sample_data
    ensure_sample_data()

    import jax
    log.info(f"backend={jax.default_backend()} devices={jax.devices()}")
    on_cpu = jax.default_backend() == "cpu"

    ndsm = os.path.join(HERE, "data", "nDSM", "324125317.tif")
    rgb = os.path.join(HERE, "data", "rgb", "324125317.tif")
    labels = args.labels or os.path.join(HERE, "data", "autolabels.gpkg")
    # non-default label sets get their own shard namespace (shards bake the
    # ground truth in; silently reusing voronoi shards would train on the
    # wrong labels)
    label_tag = ""
    if args.labels:
        label_tag = "_" + os.path.splitext(os.path.basename(args.labels))[0]
    shards_dir = os.path.join(HERE, "data", f"full_shards{label_tag}")

    # 1. autolabels from the real height raster
    from treedetection_tpu.autolabel import generate_voronoi_labels
    if not os.path.exists(labels):
        if args.labels:
            log.error(f"label set {labels} not found")
            return 1
        n = generate_voronoi_labels(ndsm, labels)
        log.info(f"[1/4] voronoi autolabels: {n} crowns")
    else:
        log.info(f"[1/4] reusing {labels}")

    # 2. 1024^2 uint8 training tiles (device-side normalization)
    from treedetection_tpu.train.data import (
        ShardDataset, make_training_tiles, train_test_split, write_shards)
    import glob
    exclude_bounds = None
    if args.holdout_frac > 0:
        from treedetection_tpu.geo import GeoTiff
        g = GeoTiff(rgb)
        b = g.bounds
        g.close()
        # CENTERED interior strip, not an edge strip: the serving pipeline's
        # overlap-interior exclusion (postprocessing.border_overlap_exclusion,
        # reference postprocessing.py:574-607) drops every crown within
        # (tile+2*buffer)*overlapping_tiles/2 = 135 m of the raster border, so
        # an edge holdout lands almost entirely in that dead band and the
        # held-out eval scores the filter, not the model.
        half = (b[2] - b[0]) * args.holdout_frac / 2.0
        cx = (b[0] + b[2]) / 2.0
        exclude_bounds = (cx - half, b[1], cx + half, b[3])
        with open(os.path.join(HERE, "data", "holdout.json"), "w") as fh:
            json.dump({"held_out_bounds": exclude_bounds,
                       "holdout_frac": args.holdout_frac}, fh)
        # shard dir is keyed by the holdout geometry: a rerun with a
        # different --holdout-frac must NOT silently reuse shards built with
        # the old exclusion (holdout.json would record bounds the training
        # set actually overlaps, inflating the held-out eval); the "c" marks
        # the centered-strip layout vs the old eastern-edge one
        shards_dir = os.path.join(
            HERE, "data",
            f"full_shards{label_tag}_holdout_c{args.holdout_frac:g}")
        log.info(f"[2/4] spatial holdout: excluding {exclude_bounds[0]:.0f} "
                 f"<= x <= {exclude_bounds[2]:.0f} "
                 f"({args.holdout_frac:.0%} of the sample) from training")
    existing = sorted(glob.glob(os.path.join(shards_dir, "train_*.npz")))
    if existing:
        shards = existing
        log.info(f"[2/4] reusing {len(shards)} shards")
    else:
        examples = make_training_tiles(
            rgb, labels, tile_size_m=50, buffer_m=20,
            input_size=args.input_size, max_gt=args.max_gt, store_uint8=True,
            exclude_bounds=exclude_bounds)
        shards = write_shards(examples, shards_dir, shard_size=8)
        log.info(f"[2/4] wrote {len(shards)} shards")
    (train_shards, val_shards), = train_test_split(shards, 0.15)

    # 3. from-scratch training at the serving resolution
    from treedetection_tpu.models.mask_rcnn import MaskRCNNConfig
    from treedetection_tpu.train import TrainConfig, train_model
    # with RANDOM init the reference preset's freeze-3 would pin 3/4 of the
    # backbone at random weights and FrozenBN leaves the net unnormalized —
    # both made the round-3 curve flat; pretrained init keeps preset parity
    pretrained = bool(args.init_from)
    freeze = args.freeze if args.freeze is not None else (3 if pretrained
                                                          else 0)
    norm = args.norm or ("frozen" if pretrained else "batch")
    mc = MaskRCNNConfig(
        depth=args.depth, input_size=args.input_size,
        rpn_pre_nms_topk=1000, rpn_post_nms_topk=512, max_detections=100,
        bf16=not on_cpu, remat=True, norm=norm)
    over = {} if args.preset == "update" else {"base_lr": args.lr}
    tc = TrainConfig.from_preset(
        args.preset, max_iter=args.iters,
        ims_per_batch=args.batch, max_gt=args.max_gt,
        backbone_freeze=freeze,
        eval_period=max(args.iters // 10, 10), patience=10,
        max_eval_batches=4, **over)
    log.info(f"norm={norm} backbone_freeze={freeze}")
    init_params = None
    if args.init_from:
        from treedetection_tpu.models.convert import load_checkpoint
        init_params = load_checkpoint(args.init_from, depth=args.depth)
        log.info(f"continuing from {args.init_from}")
    ds = ShardDataset(train_shards, batch_size=tc.ims_per_batch)
    val = ShardDataset(val_shards or train_shards[:1],
                       batch_size=tc.ims_per_batch, shuffle=False)
    t0 = time.time()
    params, history = train_model(ds, val_dataset=val, model_cfg=mc,
                                  train_cfg=tc, logger=log,
                                  init_params=init_params,
                                  checkpoint_dir=args.ckpt)
    train_s = time.time() - t0
    log.info(f"[3/4] {len(history['total_loss'])} iters in {train_s:.0f}s; "
             f"loss {history['total_loss'][0]:.3f} -> "
             f"{np.mean(history['total_loss'][-20:]):.3f}; ckpt: {args.ckpt}")

    # compact fp16 npz — the checkpoint example/config.yml serves.  A
    # batch-norm run folds its running stats into the frozen affine first,
    # so the served tree is identical to frozen-mode init (zero serving cost)
    from treedetection_tpu.models.convert import (fold_batch_stats,
                                                  save_checkpoint_npz)
    npz_path = os.path.splitext(args.ckpt)[0] + ".npz"
    save_checkpoint_npz(npz_path, fold_batch_stats(jax.device_get(params)))
    log.info(f"compact checkpoint: {npz_path} "
             f"({os.path.getsize(npz_path) / 1e6:.0f} MB)")

    report = {
        "iters": len(history["total_loss"]),
        "train_seconds": round(train_s, 1),
        "loss_first": round(float(history["total_loss"][0]), 4),
        "loss_last20_mean": round(float(np.mean(history["total_loss"][-20:])), 4),
        "val_loss": [round(float(v), 4) for v in history["val_loss"]],
        "input_size": args.input_size, "depth": args.depth,
        "backend": jax.default_backend(),
        "holdout_frac": args.holdout_frac,
        "held_out_bounds": exclude_bounds,
    }
    # non-default checkpoints get their own report file (an R101 or
    # consensus retrain must not clobber the flagship's evidence)
    base = os.path.splitext(os.path.basename(args.ckpt))[0]
    tag = ("" if base == "model_full"
           else "_" + base.replace("model_full_", ""))
    report_name = (f"train_full_report{tag}.json" if not args.holdout_frac
                   else f"train_holdout_report{tag}.json")
    with open(os.path.join(HERE, "data", report_name), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    log.info("[4/4] report written; serve with combined_model: "
             f"{os.path.relpath(args.ckpt, HERE)} + pixel_std "
             "[57.375, 57.12, 58.395] (see config.yml)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
