"""Geo core: affine transforms, a first-party GeoTIFF codec, and raster helpers.

Replaces the rasterio/GDAL layer of the reference (used throughout, e.g.
reference ``preprocessing.py:48``, ``helpers.py:1023-1085``) with a
dependency-free implementation: pure numpy + zlib TIFF decode/encode with an
optional C++ fast path, and a small Affine class with batch (vectorized)
pixel<->geo transforms that replace the CuPy ``xy_gpu`` round trips
(reference ``utilities.py:182-207``).
"""

from treedetection_tpu.geo.affine import Affine  # noqa: F401
from treedetection_tpu.geo.tiff import GeoTiff, read_geotiff, write_geotiff  # noqa: F401
