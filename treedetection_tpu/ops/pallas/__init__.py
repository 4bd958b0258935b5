"""Pallas TPU kernels for the hot non-conv ops.

Convs/matmuls stay on XLA (the MXU path the compiler already schedules well);
Pallas covers the ops XLA handles poorly at scale:

* ``iou_kernel`` — tiled pairwise box IoU / containment with fused
  thresholding, so county-scale dedupe (N in the tens of thousands) streams
  128x128 tiles through VMEM instead of materializing an N^2 fp32 matrix in
  HBM (reference equivalent: CuPy broadcast matrices,
  ``postprocessing.py:349-476``).

Every kernel has a jnp fallback selected automatically off-TPU.
"""

from treedetection_tpu.ops.pallas.iou_kernel import (  # noqa: F401
    pairwise_containment_mask, pairwise_dedupe_mask, pairwise_iou_mask)
