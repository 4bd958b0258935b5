"""Training subsystem: Mask R-CNN losses, the jitted train step, presets, and
the fine-tuning driver.

TPU-native counterpart of the reference's detectron2 training scripts
(reference ``supplementary/train_foundation_model.py``): same two
hyperparameter presets (update vs from-scratch, ``:179-191``), backbone
freezing, and early stopping (``MyTrainer(patience=10)``, ``:193-195``) — but
as a pure-functional optax loop whose step jits over a device mesh
(data-parallel batch sharding; see ``parallel``).
"""

from treedetection_tpu.train.losses import mask_rcnn_losses  # noqa: F401
from treedetection_tpu.train.train import (  # noqa: F401
    TrainConfig, make_train_step, train_model, PRESETS)
