"""treedetection_tpu — a TPU-native tree-crown detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Jonetz/TreeDetection
(reference: /root/reference): country-scale detection and delineation of individual
tree crowns in aerial RGBI orthophotos + nDSM height rasters, emitting georeferenced
crown polygons (GeoPackage).

Public API mirrors the reference package surface (reference TreeDetection/__init__.py):
``process_files``, ``preprocess_files``, ``predict_tiles``, ``postprocess_files``,
``get_config`` plus the stage modules.  The implementation is TPU-first:

* the model is a Flax Mask R-CNN (ResNet-FPN) compiled to XLA with static shapes,
* hot image/geometry math is fused jnp / Pallas kernels instead of CuPy loops,
* scale-out is a ``jax.sharding.Mesh`` over the tile stream instead of thread pools,
* geo I/O is a first-party GeoTIFF codec + GeoPackage (sqlite3) writer with a C++
  fast path (no GDAL dependency).
"""

__version__ = "0.1.0"

from treedetection_tpu.config import Config, get_config, setup_logging  # noqa: F401

__all__ = [
    "Config",
    "get_config",
    "setup_logging",
]


def __getattr__(name):
    # Lazy imports keep `import treedetection_tpu` light (no jax/flax import cost
    # until the model path is actually used).
    if name in ("process_files", "preprocess_files", "predict_tiles",
                "postprocess_files", "cleanup_files"):
        from treedetection_tpu import detection
        return getattr(detection, name)
    raise AttributeError(f"module 'treedetection_tpu' has no attribute {name!r}")
