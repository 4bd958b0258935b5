"""Utilities: profiling/tracing, stage timing, progress reporting.

The reference's observability was coarse wall-clock logging (SURVEY §5,
reference ``detection.py:350-366``); here the same logger-based spans exist
plus first-class ``jax.profiler`` trace capture for TPU work.
"""

from treedetection_tpu.utils.profiling import (  # noqa: F401
    StageTimer, profile_trace, log_progress)
