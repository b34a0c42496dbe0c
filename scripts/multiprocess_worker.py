"""One rank of a REAL multi-process (multi-host analogue) training run.

The reference's most load-bearing infrastructure is its process topology
(``run_rpn.py:620-691``: mp.spawn + TCP rendezvous + DDP).  The JAX
analogue — ``jax.distributed.initialize`` + a global mesh + per-process
data sharding + rank-0 orbax checkpointing — is exercised here with
N localhost CPU processes x M virtual devices each, through the REAL
``run_rpn`` driver (no mocks):

  * ``batch_iterator`` slices the epoch permutation by the real
    ``jax.process_index()`` (DistributedSampler semantics),
  * ``shard_batch`` assembles global arrays from the per-rank pieces
    (``jax.make_array_from_process_local_data``),
  * the jitted train step runs over a mesh spanning both processes — the
    SPMD partitioner inserts the cross-process gradient psums,
  * rank 0 (and only rank 0) evaluates and writes orbax checkpoints,
  * every rank restores ``model_best`` afterwards and reports the
    restored param norm for cross-rank comparison.

Launched by tests/test_multiprocess.py; runnable by hand:

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \\
    python scripts/multiprocess_worker.py --process-id 0 --num-processes 2 \\
        --coordinator localhost:12345 --data-dir /tmp/mp_data --save-path /tmp/mp_out &
    XLA_FLAGS=... --process-id 1 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--save-path", required=True)
    ap.add_argument("--num-epochs", type=int, default=1)
    args = ap.parse_args(argv)

    import jax

    # this image's sitecustomize force-registers the TPU tunnel plugin;
    # CPU must be forced via config BEFORE any jax.devices() call
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.process_index() == args.process_id

    import numpy as np

    from nerf_rpn_tpu.cli import run_rpn
    from nerf_rpn_tpu.parallel.mesh import process_barrier
    from nerf_rpn_tpu.train import checkpoint as ckpt_lib

    rpn_args = run_rpn.parse_args([
        "--mode", "train",
        "--features_path", args.data_dir,
        "--boxes_path", args.data_dir,
        "--dataset_split", os.path.join(args.data_dir, "split.npz"),
        "--save_path", args.save_path,
        "--resolution", "32", "--pad_multiple", "32", "--max_gt", "4",
        "--backbone_type", "resnet_tiny",
        "--rpn_head_conv_depth", "1",
        "--rpn_pre_nms_top_n_train", "128",
        "--rpn_post_nms_top_n_train", "64",
        "--rpn_pre_nms_top_n_test", "128",
        "--rpn_post_nms_top_n_test", "64",
        "--num_epochs", str(args.num_epochs),
        "--batch_size", str(2 * args.num_processes),  # 2 scenes per rank
        "--eval_interval", "1",
        "--num_workers", "0",
        "--prefetch_batches", "0",
        "--seed", "0",
    ])
    trainer = run_rpn.Trainer(rpn_args)
    assert len(trainer.mesh.devices.ravel()) == 2 * args.num_processes, (
        trainer.mesh)
    trainer.train_loop()

    # rank 0 wrote model_best during train_loop; everyone restores it.
    # (KV barrier, not sync_global_devices: the latter is a device psum
    # whose gloo handshake times out at 30s while rank 0 is still busy
    # evaluating — see mesh.process_barrier)
    process_barrier("checkpoint_written")
    restored = ckpt_lib.restore_checkpoint(
        trainer.state, os.path.join(args.save_path, "model_best"))
    leaves = jax.tree.leaves(restored.params)
    pnorm = float(np.sqrt(sum(
        float(np.sum(np.square(np.asarray(x, np.float64)))) for x in leaves)))
    out = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": jax.local_device_count(),
        "restored_param_norm": pnorm,
        "finite": bool(all(np.isfinite(np.asarray(x)).all() for x in leaves)),
    }
    with open(os.path.join(args.save_path, f"rank{args.process_id}.json"),
              "w") as f:
        json.dump(out, f)
    process_barrier("done")
    print(f"rank {args.process_id}: OK param_norm={pnorm:.6f}")


if __name__ == "__main__":
    main()
