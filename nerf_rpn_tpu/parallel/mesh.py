"""Device mesh / SPMD helpers.

The reference's whole distributed stack (mp.spawn + NCCL DDP +
DistributedSampler + manual loss all-reduces, SURVEY 2.11) collapses on TPU
to: one ``Mesh`` with a ``data`` axis, batches sharded over it, params
replicated, and a single ``jit`` — the XLA SPMD partitioner inserts every
collective (gradient psums, the FCOS num_pos normaliser, BatchNorm batch
means) automatically over ICI.

Scale-out knobs live here so models/training code never touch device lists.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Mesh over the largest device count that divides ``batch_size``
    (a batch of 1 gets a 1-device mesh, 8 scenes on 8 chips shard 1:1)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (scene) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch dict with the scene axis sharded.

    Non-array entries (e.g. scene-name lists) are dropped — step functions
    are jitted and only accept arrays; keep host metadata on the host.
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape"):
            out[k] = jax.device_put(v, sh)
        elif isinstance(v, (list, tuple)) and v and hasattr(v[0], "shape"):
            # per-level feature pyramids (stage 2): shard each level array
            out[k] = type(v)(jax.device_put(x, sh) for x in v)
    return out
