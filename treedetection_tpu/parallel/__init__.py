"""Scale-out: device meshes, tile-stream sharding, and multi-host file
partitioning.

The reference's concurrency story was ThreadPools over files + one GPU
(SURVEY §2.4); the TPU-native equivalent is:

* **within a slice**: the tile batch shards over a 1-D ``data`` mesh axis —
  inference is embarrassingly data-parallel, training all-reduces grads over
  ICI (XLA inserts the psum from the sharding annotations)
* **across hosts**: the *file list* partitions by host id
  (``partition_files``), each host writing sharded recovery manifests
  (``recoveries._shard_suffix``) — no cross-host coordination needed beyond
  the filesystem, preserving the reference's resumability contract
"""

from treedetection_tpu.parallel.mesh import (  # noqa: F401
    ensure_distributed, make_mesh, shard_batch, replicate, partition_files,
    sharded_forward)
