"""Orbax checkpointing with the reference's retention/selection policy.

Parity target (``run_rpn.py:294-308``, ``run_rpn_detect.py:261-316``):
per-epoch checkpoints ``epoch_{N}`` containing backbone + head params (and,
for the RCNN driver, optimizer + scheduler state), ``model_best`` tracked by
Recall@50 on val, rolling deletion keeping the newest K by mtime, and
``train_args`` embedded for provenance.  Here one orbax PyTree checkpoint
holds {params, batch_stats, opt_state, step}; args go in a json sidecar.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def _local_numpy(x):
    """Materialise an array locally for a single-process orbax save.

    In a multi-process run the rank-0-only checkpoint policy (reference
    ``run_rpn.py:359-370``) means orbax cannot coordinate a distributed
    save — but train state is REPLICATED (params/opt_state/batch_stats are
    never sharded), so every process holds the full value in its first
    addressable shard.  Sharded arrays are rejected loudly rather than
    silently saving one shard."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shard = x.addressable_shards[0].data
        if shard.shape != x.shape:
            raise ValueError(
                f"cannot rank-0-save a sharded array (shape {x.shape}, "
                f"local shard {shard.shape}); gather it first")
        return np.asarray(shard)
    return x


def _checkpointer() -> ocp.StandardCheckpointer:
    """Rank-LOCAL orbax checkpointer.

    The reference's checkpoint policy is rank-0-only (``run_rpn.py:359-370``)
    — but a default orbax ``StandardCheckpointer`` under
    ``jax.distributed`` runs ``sync_global_processes`` (a device psum) inside
    every save, which deadlocks (and times out the gloo handshake) when only
    rank 0 is saving.  ``active_processes={this rank}`` makes every orbax
    sync a no-op (``multihost.should_skip_process_sync``) and
    ``primary_host=this rank`` keeps the actual write; the state is already
    materialised host-locally by ``_local_numpy``."""
    if jax.process_count() == 1:
        return ocp.StandardCheckpointer()
    me = jax.process_index()
    return ocp.StandardCheckpointer(
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"rank{me}"))


def _to_saveable(state) -> dict:
    return jax.tree.map(_local_numpy, {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    })


def save_checkpoint(state, path: str, train_args: dict | None = None):
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with _checkpointer() as ckptr:
        ckptr.save(path, _to_saveable(state))
    if train_args is not None:
        with open(path + ".args.json", "w") as f:
            json.dump({k: str(v) for k, v in train_args.items()}, f, indent=2)


def restore_checkpoint(state, path: str, backbone_only: bool = False,
                       load_opt_state: bool = True):
    """Restore into an existing state (shape/dtype template).

    ``backbone_only`` keeps only params whose top-level key is 'backbone'
    (reference ``--load_backbone_only``, ``run_rpn.py:183-191``).

    Also accepts ``.msgpack`` files produced by
    ``tools/convert_weights.py`` (converted reference torch checkpoints,
    containing {params, batch_stats}).
    """
    path = os.path.abspath(path)
    if path.endswith(".msgpack"):
        from flax.serialization import msgpack_restore

        with open(path, "rb") as f:
            variables = msgpack_restore(f.read())
        params = variables["params"]
        batch_stats = variables.get("batch_stats") or state.batch_stats
        if backbone_only:
            merged = dict(state.params)
            merged["backbone"] = params["backbone"]
            return state.replace(params=merged)
        return state.replace(params=params, batch_stats=batch_stats)
    with _checkpointer() as ckptr:
        target = jax.tree.map(np.asarray, _to_saveable(state))
        restored = ckptr.restore(path, target=target)
    params = dict(state.params)
    if backbone_only:
        params["backbone"] = restored["params"]["backbone"]
        return state.replace(params=params)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"] if load_opt_state else state.opt_state,
    )


def load_raw_checkpoint(path: str) -> dict:
    """Load a checkpoint as a raw pytree dict (orbax dir or .msgpack) without
    needing a structure template — for partial restores like
    ``--pretrained`` backbone transfer."""
    path = os.path.abspath(path)
    if path.endswith(".msgpack"):
        from flax.serialization import msgpack_restore

        with open(path, "rb") as f:
            return msgpack_restore(f.read())
    with _checkpointer() as ckptr:
        return ckptr.restore(path)


def delete_old_checkpoints(save_path: str, keep_latest: int = 5):
    ckpts = sorted(glob.glob(os.path.join(save_path, "epoch_*")),
                   key=os.path.getmtime)
    ckpts = [c for c in ckpts if os.path.isdir(c)]
    for c in ckpts[:-keep_latest] if keep_latest > 0 else ckpts:
        shutil.rmtree(c, ignore_errors=True)
        args_file = c + ".args.json"
        if os.path.isfile(args_file):
            os.remove(args_file)
