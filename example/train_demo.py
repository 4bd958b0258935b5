"""Closed-loop training demo: nDSM autolabels -> tiles -> fine-tune -> eval.

Demonstrates the full reference workflow (autolabel like
``pretraining_generate_voronoi.py`` -> train like
``train_foundation_model.py`` -> validate like ``training_validation.py``)
end-to-end on the bundled sample, at demo scale (small model, few iterations —
the point is the machinery, not accuracy).

Run: ``python example/train_demo.py [--iters N]``
Produces ``data/model_demo.ckpt`` (orbax) loadable by the Predictor via
``combined_model`` in the YAML config.
"""

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=60)
    parser.add_argument("--input-size", type=int, default=128)
    parser.add_argument("--depth", type=int, default=50)
    args = parser.parse_args()

    sys.path.insert(0, HERE)
    from example import ensure_sample_data  # sibling example.py
    ensure_sample_data()

    ndsm = os.path.join(HERE, "data", "nDSM", "324125317.tif")
    rgb = os.path.join(HERE, "data", "rgb", "324125317.tif")
    labels = os.path.join(HERE, "data", "autolabels.gpkg")
    shards_dir = os.path.join(HERE, "data", "train_shards")
    ckpt = os.path.join(HERE, "data", "model_demo.ckpt")

    # 1. autolabel crowns from the height raster
    from treedetection_tpu.autolabel import generate_voronoi_labels
    n = generate_voronoi_labels(ndsm, labels)
    print(f"[1/4] voronoi autolabels: {n} crowns")

    # 2. cut training tiles and shard them
    from treedetection_tpu.train.data import (
        ShardDataset, make_training_tiles, train_test_split, write_shards)
    examples = make_training_tiles(rgb, labels, tile_size_m=50, buffer_m=10,
                                   input_size=args.input_size, max_gt=32)
    shards = write_shards(examples, shards_dir, shard_size=16)
    (train_shards, val_shards), = [train_test_split(shards, 0.25)[0]]
    print(f"[2/4] {len(shards)} shards ({len(train_shards)} train / "
          f"{len(val_shards)} val)")

    # 3. fine-tune
    from treedetection_tpu.models.mask_rcnn import MaskRCNNConfig
    from treedetection_tpu.train import TrainConfig, train_model
    mc = MaskRCNNConfig(depth=args.depth, input_size=args.input_size,
                        rpn_pre_nms_topk=256, rpn_post_nms_topk=128,
                        max_detections=32, bf16=False)
    tc = TrainConfig.from_preset("update", max_iter=args.iters,
                                 eval_period=max(args.iters // 3, 10),
                                 ims_per_batch=2)
    ds = ShardDataset(train_shards, batch_size=tc.ims_per_batch)
    val = ShardDataset(val_shards, batch_size=tc.ims_per_batch, shuffle=False)
    import logging
    logging.basicConfig(level=logging.INFO)
    params, history = train_model(ds, val_dataset=val, model_cfg=mc,
                                  train_cfg=tc,
                                  logger=logging.getLogger("train_demo"),
                                  checkpoint_dir=ckpt)
    print(f"[3/4] trained {len(history['total_loss'])} iters; "
          f"loss {history['total_loss'][0]:.3f} -> "
          f"{history['total_loss'][-1]:.3f}; checkpoint: {ckpt}")

    # 4. sanity: reload the checkpoint and run one batch forward
    from treedetection_tpu.models.convert import load_checkpoint
    from treedetection_tpu.models.mask_rcnn import MaskRCNN
    import jax.numpy as jnp
    restored = load_checkpoint(ckpt)
    model = MaskRCNN(mc)
    out = model.apply(restored, jnp.zeros(
        (1, args.input_size, args.input_size, 3), dtype=jnp.float32))
    print(f"[4/4] checkpoint reload OK; forward boxes {out.boxes.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
