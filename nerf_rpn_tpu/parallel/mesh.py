"""Device mesh / SPMD helpers.

The reference's whole distributed stack (mp.spawn + NCCL DDP +
DistributedSampler + manual loss all-reduces, SURVEY 2.11) collapses on TPU
to: one ``Mesh`` with a ``data`` axis, batches sharded over it, params
replicated, and a single ``jit`` — the XLA SPMD partitioner inserts every
collective (gradient psums, the FCOS num_pos normaliser, BatchNorm batch
means) automatically over ICI.

Scale-out knobs live here so models/training code never touch device lists.

Two mesh axes:

- ``data`` — scenes (the model's natural parallelism; the reference's DDP).
- ``space`` — the scene's leading spatial (x) axis, for grids too large for
  one chip's HBM (a 512^3 x 4 rgbsigma grid is 2 GB before activations).
  Params stay replicated; GSPMD inserts halo exchanges for the conv
  stencils and all-gathers where an op needs the full extent (the propose
  stage's flattened top-k).  The step functions are unchanged — sharding
  is decided entirely by how the batch is ``device_put``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def process_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Coordinator (key-value) barrier across processes — NOT a device
    collective.

    Two places in a multi-process run where ranks skew by more than the
    CPU-collective handshake timeout (~30 s, hardcoded in XLA's gloo
    transport): (1) the first train step — each rank compiles the big step
    graph at its own pace, and the fastest rank starts executing (forming
    the gloo clique) while the slowest is still compiling; (2) epoch ends —
    rank 0 evaluates + checkpoints (reference ``run_rpn.py:359-370``
    topology) while the other ranks sit in the next step's collective.
    ``multihost_utils.sync_global_devices`` cannot fix either: it IS a
    device psum, so it forms the very clique that times out.  This barrier
    rides the ``jax.distributed`` coordinator channel instead (the same TCP
    rendezvous the reference's ``init_process_group`` uses), which has no
    such timeout.  No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        # process_count mocked without jax.distributed.initialize (the
        # single-process seam tests): nothing to rendezvous with
        return
    client.wait_at_barrier(name, timeout_ms)


def local_replica(tree):
    """Process-local copy of a REPLICATED pytree that spans processes.

    Train state lives on the global (multi-process) mesh, where arrays are
    not fully addressable; the rank-0-only eval path (reference evaluates
    the whole val set on rank 0, ``run_rpn.py:359-370``) computes on a
    process-LOCAL mesh, and jit refuses mixed device sets.  Params /
    opt_state / batch_stats are replicated, so every process holds the full
    value in its first addressable shard — fetch it to host numpy and let
    the local jit re-place it.  Sharded arrays are rejected loudly."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shard = x.addressable_shards[0].data
            if shard.shape != x.shape:
                raise ValueError(
                    f"local_replica of a SHARDED array (shape {x.shape}, "
                    f"local shard {shard.shape}); gather it first")
            return np.asarray(shard)
        return x
    return jax.tree.map(fetch, tree)


def make_mesh_2d(n_data: int, n_space: int, devices=None) -> Mesh:
    """(data, space) mesh: scenes over ``data``, each scene's x axis over
    ``space``.  ``n_space`` consecutive devices hold one scene, so the halo
    exchanges of the conv stencils ride neighbour ICI links."""
    if devices is None:
        devices = jax.devices()
    assert n_data * n_space <= len(devices), (
        f"mesh {n_data}x{n_space} needs {n_data * n_space} devices, "
        f"have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, X, Y, Z, C) grids: scenes over ``data`` and, when the mesh
    has a ``space`` axis, the x extent over ``space``."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def make_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Mesh over the largest device count that divides ``batch_size``
    (a batch of 1 gets a 1-device mesh, 8 scenes on 8 chips shard 1:1).

    Multi-process: every process must contribute the SAME number of mesh
    devices (its per-rank batch shard lands on its own devices), so the
    mesh takes the first n_local devices of EVERY process, n_local =
    largest local count dividing the per-rank batch."""
    if devices is None:
        world = jax.process_count()
        if world > 1:
            per_rank = max(1, batch_size // world)
            n_local = jax.local_device_count()
            while n_local > 1 and per_rank % n_local != 0:
                n_local -= 1
            by_proc = {}
            for d in jax.devices():
                by_proc.setdefault(d.process_index, []).append(d)
            devs = []
            for p in sorted(by_proc):
                devs.extend(by_proc[p][:n_local])
            return Mesh(np.asarray(devs), (DATA_AXIS,))
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


# Batch keys that hold (B, X, Y, Z, C) voxel grids and therefore may shard
# their x extent over a ``space`` mesh axis.  Keyed explicitly (not on
# ndim == 5) so a future 5-D per-scene entry that is NOT a spatial grid
# can't silently pick up a space sharding.
GRID_KEYS = frozenset({"grids"})


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch dict with the scene axis sharded.

    On a (data, space) mesh the grid entries (``GRID_KEYS``) additionally
    shard their x extent over ``space``; per-scene arrays (gt boxes, sizes)
    shard over ``data`` only.  Non-array entries (e.g. scene-name lists)
    are dropped — step functions are jitted and only accept arrays; keep
    host metadata on the host.
    """
    sh = batch_sharding(mesh)
    grid_sh = grid_sharding(mesh)
    n_space = mesh.shape.get(SPACE_AXIS, 1)
    multiproc = jax.process_count() > 1

    def put(v, sharding):
        if multiproc:
            # Each process holds only ITS shard of the global batch (the
            # batch_iterator slices per process_index); assemble the global
            # array from the local pieces.  A plain device_put here would
            # treat every rank's local batch as the whole global value.
            return jax.make_array_from_process_local_data(sharding, v)
        return jax.device_put(v, sharding)

    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape"):
            is_grid = k in GRID_KEYS and v.ndim == 5
            if is_grid and n_space > 1 and v.shape[1] % n_space != 0:
                raise ValueError(
                    f"grid batch entry {k!r} has x extent {v.shape[1]} not "
                    f"divisible by the mesh space axis ({n_space}); pad the "
                    f"grid (collate pad_multiple) to a multiple of it"
                )
            out[k] = put(v, grid_sh if is_grid else sh)
        elif isinstance(v, (list, tuple)) and v and hasattr(v[0], "shape"):
            # per-level feature pyramids (stage 2): shard each level array
            out[k] = type(v)(put(x, sh) for x in v)
    return out
