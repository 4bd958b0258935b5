"""Flax Mask R-CNN (ResNet-FPN) — the TPU-native replacement for the
reference's detectron2 model (reference ``config.py:25-66``,
``prediction.py:181-183``).

Everything is static-shape so the full forward compiles to a single XLA
program: padded proposal/detection budgets, fori-loop NMS, gather-based
ROIAlign.  Weights can be randomly initialized or converted from detectron2
``.pth`` checkpoints (``models.convert``).
"""

from treedetection_tpu.models.mask_rcnn import MaskRCNN, MaskRCNNConfig  # noqa: F401
from treedetection_tpu.models.resnet import ResNetFPN  # noqa: F401
