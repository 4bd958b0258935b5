"""Mesh construction and sharding helpers."""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(config: Optional[Dict[str, Any]] = None,
              devices: Optional[Sequence] = None,
              axis: str = "data") -> Mesh:
    """1-D mesh over the available devices (tile inference is data-parallel;
    SURVEY §2.4: DP is the only parallelism with a counterpart in this
    workload — TP/PP/SP/EP are N/A for a conv detector on independent tiles)."""
    if devices is not None:
        devs = list(devices)
    elif config and config.get("devices"):
        # honor the YAML `device:` selection resolved by
        # config.set_device_configuration (e.g. device: cpu for debugging
        # beside a busy TPU) instead of whatever the default backend is
        devs = list(config["devices"])
    else:
        devs = list(jax.devices())
    shape = None
    if config and config.get("mesh_shape"):
        ms = config["mesh_shape"]
        if isinstance(ms, dict):
            axis = next(iter(ms))
            shape = int(ms[axis])
    if shape:
        devs = devs[:shape]
    return Mesh(np.array(devs), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place an array (or pytree) with its leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def sharded_forward(model, mesh: Mesh, axis: str = "data") -> Callable:
    """Jit the model forward with batch-sharded inputs and replicated params.

    The batch dim must be divisible by the mesh size (the tile streamer pads
    its final batch, so this holds by construction).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    @jax.jit
    def fwd(params, images):
        images = jax.lax.with_sharding_constraint(images, data)
        return model.apply(params, images)

    return fwd


def ensure_distributed(config: Optional[Dict[str, Any]] = None,
                       logger=None) -> bool:
    """Initialize ``jax.distributed`` once for multi-host runs.

    Triggered by ``multihost: true`` in the YAML config or the standard
    coordinator env (``JAX_COORDINATOR_ADDRESS``); a no-op single-host
    otherwise.  Returns True when running multi-process."""
    if jax.process_count() > 1:
        return True
    want = bool((config or {}).get("multihost")) or \
        bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not want:
        return False
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError) as exc:
        if logger:
            logger.warning(f"jax.distributed.initialize failed: {exc}; "
                           f"continuing single-host")
        return False
    return jax.process_count() > 1


def partition_files(files: Sequence[str],
                    host_id: Optional[int] = None,
                    num_hosts: Optional[int] = None) -> List[str]:
    """Deterministic per-host slice of the work list — the multi-host
    replacement for the reference's ThreadPool file loops.  Host identity
    comes from args or ``jax.process_index()``/``TREEDETECTION_HOST_ID``."""
    if num_hosts is None:
        num_hosts = int(os.environ.get("TREEDETECTION_NUM_HOSTS",
                                       jax.process_count()))
    if host_id is None:
        host_id = int(os.environ.get("TREEDETECTION_HOST_ID",
                                     jax.process_index()))
    ordered = sorted(files)
    return [f for i, f in enumerate(ordered) if i % max(num_hosts, 1) == host_id]
