"""Is the train step host/dispatch-bound through the tunnel?

The r3 train-step trace shows ~127-129 ms of device time per step while the
bench wall-clock is ~139 ms/step — a ~10 ms/step gap that conv-roofline
work cannot explain.  Three timings in ONE process (same session, warm
cache) isolate it:

  A. the bench loop as-is (per-step fold_in dispatch + train_step dispatch)
  B. keys precomputed on device before the timed loop (1 dispatch/step)
  C. K steps per dispatch: jit(lax.scan(train_step)) over stacked batches
     (1/K dispatches per step — the classic TPU amortization)

Usage: python benchmarks/microbench_train_dispatch.py [--k 4] [--reps 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import random_state
    from nerf_rpn_tpu.models.nerf_rpn import NeRFRPN
    from nerf_rpn_tpu.models.rpn import RPNConfig
    from nerf_rpn_tpu.train.steps import make_rpn_train_step

    shape = (160, 160, 160)
    batch = 2
    model = NeRFRPN(backbone_type="swin_s", resolution=max(shape),
                    rotated=True, conv_depth=4, dtype=jnp.bfloat16)
    cfg = RPNConfig(rotated=True)
    rng = np.random.default_rng(0)
    n_gt = 16
    ctr = rng.uniform(20, 140, (batch, n_gt, 3))
    size = rng.uniform(8, 40, (batch, n_gt, 3))
    theta = rng.uniform(-np.pi / 2, np.pi / 2, (batch, n_gt, 1))
    batch_d = {
        "grids": jnp.asarray(
            rng.uniform(0, 1, (batch, *shape, 4)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "ori_sizes": jnp.full((batch, 3), 160, jnp.int32),
        "gt_boxes": jnp.asarray(
            np.concatenate([ctr, size, theta], -1).astype(np.float32)),
        "gt_mask": jnp.ones((batch, n_gt), bool),
    }
    state = random_state(model, batch_d["grids"][:1, :32, :32, :32],
                         with_opt=True)
    train_step, _ = make_rpn_train_step(model, cfg, shape)
    key = jax.random.PRNGKey(0)

    def timed(label, fn, state, reps, steps_per_call=1):
        st = fn(state, reps)          # warm/compile
        st = fn(st, max(reps // 2, 2))  # throwaway timed loop (tunnel)
        t0 = time.perf_counter()
        st = fn(st, reps)
        dt = (time.perf_counter() - t0) / (reps * steps_per_call)
        print(f"{label}: {dt * 1e3:.2f} ms/step "
              f"({batch / dt:.2f} scenes/s/chip)", flush=True)
        return st

    # A: per-step fold_in (the bench loop)
    def run_a(st, reps):
        loss = None
        for i in range(reps):
            st, m = train_step(st, batch_d, jax.random.fold_in(key, i))
            loss = m["loss"]
        float(loss)
        return st

    # B: keys precomputed before the loop
    keys = jax.random.split(key, 64)

    def run_b(st, reps):
        loss = None
        for i in range(reps):
            st, m = train_step(st, batch_d, keys[i % 64])
            loss = m["loss"]
        float(loss)
        return st

    # C: K steps per dispatch via lax.scan (jit-of-jit inlines train_step)
    k = args.k
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (k, *x.shape)), batch_d)

    @jax.jit
    def multi(st, batches, ks):
        def body(s, xk):
            b, kk = xk
            s, m = train_step(s, b, kk)
            return s, m["loss"]
        return jax.lax.scan(body, st, (batches, ks))

    def run_c(st, reps):
        loss = None
        for i in range(reps):
            st, losses = multi(st, stacked, jax.random.split(
                jax.random.fold_in(key, 1000 + i), k))
            loss = losses[-1]
        float(loss)
        return st

    state = timed("A per-step fold_in ", run_a, state, args.reps)
    state = timed("B precomputed keys ", run_b, state, args.reps)
    state = timed(f"C scan k={k} per jit", run_c, state,
                  max(args.reps // k, 2), steps_per_call=k)


if __name__ == "__main__":
    main()
