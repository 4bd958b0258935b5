"""Autolabeling: training-label generation without human annotation.

* ``voronoi`` — nDSM-only crown labels (reference
  ``supplementary/pretraining_generate_voronoi.py``)
* ``boxes`` — box-prompted crown cleaning used with SAM-style mask generators
  (reference ``supplementary/segment_annotations.py``; the SAM model itself is
  an external dependency and is injected as a callable)
"""

from treedetection_tpu.autolabel.voronoi import generate_voronoi_labels  # noqa: F401
