"""Jitted compute ops: boxes, NMS, ROIAlign, masks, image transforms, NDVI.

These replace the CuPy/numba/OpenCV kernels of the reference (SURVEY §2.3)
with XLA-compiled jnp (and, where profitable, Pallas) implementations.  All
ops are static-shape and vmap/pjit-friendly.
"""

from treedetection_tpu.ops.boxes import (  # noqa: F401
    box_iou_matrix, apply_deltas, encode_deltas, clip_boxes, box_area,
)
from treedetection_tpu.ops.nms import batched_nms, nms_mask  # noqa: F401
from treedetection_tpu.ops.roi_align import roi_align, multilevel_roi_align  # noqa: F401
from treedetection_tpu.ops.image import (  # noqa: F401
    resize_bilinear, normalize_bgr, ndvi_from_rgbi, rgbi_to_model_input,
)
from treedetection_tpu.ops.masks import paste_masks_in_image  # noqa: F401
