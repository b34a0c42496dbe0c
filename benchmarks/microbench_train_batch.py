"""Train-step batch scaling on one chip (VERDICT r4 #6).

The blessed train config (reference ``train.sh:8-27``) runs global batch 8
over 4 GPUs = 2 scenes/device.  The r4 EVAL batch study found single-chip
batching LOSES (batch-1 38.1 vs batch-2 34.95 scenes/s) — this harness asks
the same question of the TRAIN step: is 2/device actually the right
per-chip batch, or should multi-chip guidance be batch-1 + more data
parallelism?

Runs the full anchor-RPN train step (swin_s OBB 160^3, the bench.py
``bench_rpn_train`` graph) at batch 1, 2 and 4 in ONE process with the
chained-step protocol (state feeds state; one scalar fetch per loop;
throwaway timed loop first — CLAUDE.md tunnel rules).  Usage:

    python benchmarks/microbench_train_batch.py [--reps 8]

One TPU job at a time (CLAUDE.md): do not run beside bench.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def run_batch(batch, reps):
    import bench
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.steps import make_rpn_train_step

    shape = bench.SHAPE_FCOS
    model = NeRFRPN(backbone_type="swin_s", resolution=max(shape),
                    rotated=True, conv_depth=4, dtype=jax.numpy.bfloat16)
    cfg = RPNConfig(rotated=True)
    batch_d = bench._train_batch(shape, batch)
    state = bench.random_state(model, batch_d["grids"][:1, :32, :32, :32],
                               with_opt=True)
    train_step, _ = make_rpn_train_step(model, cfg, shape)
    key = jax.random.PRNGKey(0)

    def run(state, n):
        loss = None
        for i in range(n):
            state, metrics = train_step(state, batch_d,
                                        jax.random.fold_in(key, i))
            loss = metrics["loss"]
        float(loss)
        return state

    t0 = time.perf_counter()
    state = run(state, bench.WARMUP)          # compile + warm
    compile_s = time.perf_counter() - t0
    state = run(state, max(reps // 2, 3))     # throwaway timed loop
    t0 = time.perf_counter()
    state = run(state, reps)
    step_s = (time.perf_counter() - t0) / reps

    row = {"batch": batch, "step_ms": round(step_s * 1e3, 2),
           "scenes_per_s": round(batch / step_s, 3),
           "compile_s": round(compile_s, 1)}
    try:
        ca = train_step.lower(state, batch_d, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        peak = bench.PEAK_FLOPS.get(jax.devices()[0].device_kind)
        if flops and peak:
            row["mfu_pct"] = round(flops / step_s / peak * 100, 2)
            row["step_tflops"] = round(flops / 1e12, 3)
    except Exception:
        pass
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    for b in args.batches:
        row = run_batch(b, args.reps)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
