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


def _to_saveable(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(state, path: str, train_args: dict | None = None):
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
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
    with ocp.StandardCheckpointer() as ckptr:
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
    with ocp.StandardCheckpointer() as ckptr:
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
